## deciphon-tpu developer targets.
##
## `make check` is the rebuild's analogue of the reference's CI matrix
## (/root/reference/.github/workflows/test.yml: ASan+UBSan x
## IMM_DOUBLE_PRECISION On/Off): the full suite runs under BOTH float
## widths in one invocation and fails if either fails.  Python+XLA have
## no ASan analogue; the width axis is the part that bites numerics.

PY ?= python

.PHONY: check check-f32 check-f64 check-fast native bench

check: check-f32 check-f64

check-f32:
	$(PY) -m pytest tests/ -q

check-f64:
	JAX_ENABLE_X64=1 $(PY) -m pytest tests/ -q

# quick pre-commit loop: stop at first failure, skip the slow f64 pass
check-fast:
	$(PY) -m pytest tests/ -x -q

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py
