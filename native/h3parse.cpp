// Fast HMMER3 ASCII profile parser.
//
// Native-code counterpart of deciphon_tpu/models/h3reader.py, playing the
// role the external `hmr` C library plays for the reference
// (reference: src/model/protein_h3reader.c:18-72 drives hmr_next_prof /
// hmr_next_node; CMakeLists.txt:12).  Pressing Pfam-scale .hmm files is
// parse-bound, so the tokenizer/float conversion runs in C++; the tensor
// compilation stays in Python/JAX.
//
// C ABI (ctypes-friendly), streaming one profile at a time:
//   dcp_h3_open(path)        -> handle (NULL on error)
//   dcp_h3_next(h)           -> core length K (>0), 0 at EOF, -1 on error
//   dcp_h3_name/accession(h) -> strings valid until the next call
//   dcp_h3_match/insert/trans/consensus(h) -> pointers into the handle's
//       buffers: match/insert are [K*20] doubles (natural-log probs, file
//       residue order preserved), trans is [(K+1)*7], consensus [K] chars.
//   dcp_h3_residues(h)       -> the 20-char residue order of the header
//   dcp_h3_error(h)          -> last error message
//   dcp_h3_close(h)
//
// Scores in the file are -ln(p); '*' encodes p = 0 (returned as -inf).

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

struct H3Handle {
  FILE* fp = nullptr;
  std::string line;
  std::string name, accession, residues, error;
  std::vector<double> match, insert, trans;
  std::vector<char> consensus;
  int leng = 0;
  bool cons_flag = false;

  bool getline() {
    line.clear();
    int c;
    bool any = false;
    while ((c = std::fgetc(fp)) != EOF) {
      any = true;
      if (c == '\n') return true;
      line.push_back(static_cast<char>(c));
    }
    return any;
  }

  bool next_nonempty() {
    while (getline()) {
      size_t i = line.find_first_not_of(" \t\r");
      if (i != std::string::npos) {
        if (i > 0) line.erase(0, i);
        size_t e = line.find_last_not_of(" \t\r");
        line.erase(e + 1);
        return true;
      }
    }
    return false;
  }
};

double parse_score(const char* tok) {
  if (tok[0] == '*' && tok[1] == '\0')
    return -std::numeric_limits<double>::infinity();
  return -std::strtod(tok, nullptr);
}

// split `s` into whitespace tokens (in place pointers)
void tokenize(std::string& s, std::vector<char*>& out) {
  out.clear();
  char* p = s.data();
  char* end = p + s.size();
  while (p < end) {
    while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (p >= end) break;
    out.push_back(p);
    while (p < end && !std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (p < end) *p++ = '\0';
  }
}

}  // namespace

extern "C" {

void* dcp_h3_open(const char* path) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return nullptr;
  auto* h = new H3Handle;
  h->fp = fp;
  return h;
}

void dcp_h3_close(void* hv) {
  auto* h = static_cast<H3Handle*>(hv);
  if (!h) return;
  if (h->fp) std::fclose(h->fp);
  delete h;
}

const char* dcp_h3_error(void* hv) {
  return static_cast<H3Handle*>(hv)->error.c_str();
}
const char* dcp_h3_name(void* hv) {
  return static_cast<H3Handle*>(hv)->name.c_str();
}
const char* dcp_h3_accession(void* hv) {
  return static_cast<H3Handle*>(hv)->accession.c_str();
}
const char* dcp_h3_residues(void* hv) {
  return static_cast<H3Handle*>(hv)->residues.c_str();
}
const double* dcp_h3_match(void* hv) {
  return static_cast<H3Handle*>(hv)->match.data();
}
const double* dcp_h3_insert(void* hv) {
  return static_cast<H3Handle*>(hv)->insert.data();
}
const double* dcp_h3_trans(void* hv) {
  return static_cast<H3Handle*>(hv)->trans.data();
}
const char* dcp_h3_consensus(void* hv) {
  return static_cast<H3Handle*>(hv)->consensus.data();
}

int dcp_h3_next(void* hv) {
  auto* h = static_cast<H3Handle*>(hv);
  std::vector<char*> toks;

  // header stanza
  if (!h->next_nonempty()) return 0;  // EOF
  if (h->line.rfind("HMMER3", 0) != 0) {
    h->error = "expected HMMER3 magic";
    return -1;
  }
  h->name.clear();
  h->accession.clear();
  h->leng = 0;
  h->cons_flag = false;
  while (true) {
    if (!h->next_nonempty()) {
      h->error = "truncated header";
      return -1;
    }
    if (h->line.rfind("HMM ", 0) == 0 || h->line == "HMM") break;
    tokenize(h->line, toks);
    if (toks.size() < 2) continue;
    if (!std::strcmp(toks[0], "NAME")) h->name = toks[1];
    else if (!std::strcmp(toks[0], "ACC")) h->accession = toks[1];
    else if (!std::strcmp(toks[0], "LENG")) h->leng = std::atoi(toks[1]);
    else if (!std::strcmp(toks[0], "CONS"))
      h->cons_flag = !std::strcmp(toks[1], "yes");
    else if (!std::strcmp(toks[0], "ALPH") &&
             std::strcmp(toks[1], "amino") != 0) {
      h->error = "only amino HMMs are supported";
      return -1;
    }
  }
  if (h->leng <= 0) {
    h->error = "missing or invalid LENG";
    return -1;
  }
  // residue order from the HMM line itself
  tokenize(h->line, toks);
  if (toks.size() < 21) {
    h->error = "bad HMM residue header";
    return -1;
  }
  h->residues.clear();
  for (int i = 1; i <= 20; ++i) h->residues.push_back(toks[i][0]);

  if (!h->next_nonempty()) {  // transition header line
    h->error = "truncated transition header";
    return -1;
  }

  const int K = h->leng;
  h->match.assign(static_cast<size_t>(K) * 20, 0.0);
  h->insert.assign(static_cast<size_t>(K) * 20, 0.0);
  h->trans.assign(static_cast<size_t>(K + 1) * 7, 0.0);
  h->consensus.assign(K + 1, '\0');

  // BEGIN node: optional COMPO line, insert-0 line, transition line
  if (!h->next_nonempty()) {
    h->error = "truncated body";
    return -1;
  }
  if (h->line.rfind("COMPO", 0) == 0) {
    if (!h->next_nonempty()) {
      h->error = "truncated body";
      return -1;
    }
  }
  // insert-0 emissions: discarded, matching the reference press path
  if (!h->next_nonempty()) {
    h->error = "truncated BEGIN stanza";
    return -1;
  }
  tokenize(h->line, toks);
  if (toks.size() < 7) {
    h->error = "bad BEGIN transitions";
    return -1;
  }
  for (int t = 0; t < 7; ++t) h->trans[t] = parse_score(toks[t]);

  for (int k = 0; k < K; ++k) {
    if (!h->next_nonempty()) {
      h->error = "truncated node stanza";
      return -1;
    }
    tokenize(h->line, toks);
    if (toks.size() < 21 || std::atoi(toks[0]) != k + 1) {
      h->error = "unexpected node index";
      return -1;
    }
    for (int a = 0; a < 20; ++a)
      h->match[static_cast<size_t>(k) * 20 + a] = parse_score(toks[a + 1]);
    // annotation columns: MAP CONS RF [MM] CS — CONS is the second
    h->consensus[k] =
        (h->cons_flag && toks.size() >= 23) ? toks[22][0] : '-';

    if (!h->next_nonempty()) {
      h->error = "truncated insert line";
      return -1;
    }
    tokenize(h->line, toks);
    for (int a = 0; a < 20 && a < static_cast<int>(toks.size()); ++a)
      h->insert[static_cast<size_t>(k) * 20 + a] = parse_score(toks[a]);

    if (!h->next_nonempty()) {
      h->error = "truncated transition line";
      return -1;
    }
    tokenize(h->line, toks);
    if (toks.size() < 7) {
      h->error = "bad node transitions";
      return -1;
    }
    for (int t = 0; t < 7; ++t)
      h->trans[static_cast<size_t>(k + 1) * 7 + t] = parse_score(toks[t]);
  }

  if (!h->next_nonempty() || h->line.rfind("//", 0) != 0) {
    h->error = "expected '//' profile terminator";
    return -1;
  }
  return K;
}

// Count profiles ('//' terminators) — hmr_count_profiles equivalent
// (reference: src/server/hmm.c:128).
long dcp_h3_count(const char* path) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  long n = 0;
  std::string line;
  int c;
  bool at_bol = true;
  int slashes = 0;
  while ((c = std::fgetc(fp)) != EOF) {
    if (at_bol && c == '/') {
      ++slashes;
      if (slashes == 2) {
        ++n;
        slashes = 0;
        at_bol = false;
      }
      continue;
    }
    slashes = 0;
    at_bol = (c == '\n');
  }
  std::fclose(fp);
  return n;
}

}  // extern "C"
