"""Minimal FASTA reader/writer for local scan input."""

from __future__ import annotations

from typing import Iterator


def read_fasta(path: str) -> Iterator[tuple[str, str]]:
    name = None
    chunks: list[str] = []
    with open(path, "r", encoding="utf-8") as fp:
        for line in fp:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)


def write_fasta(path: str, records) -> None:
    with open(path, "w", encoding="utf-8") as fp:
        for name, seq in records:
            fp.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                fp.write(seq[i : i + 70] + "\n")
