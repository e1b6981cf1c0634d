// Native graph Smith-Waterman engine: exact fill + traceback.
//
// Host-side runtime companion to the TPU batched scorer: the device ranks
// orientations and computes scores/uniqueness for thousands of reads at
// once (paragraph_tpu/ops/*_sw.py); this library produces the node-CIGARs
// for kept reads at C speed. It implements the same recurrences and
// traceback preference rules as paragraph_tpu/align/gssw.py (which is
// differentially validated cell-exactly against the reference gssw C
// library at /root/reference/external/gssw/gssw.c) — written from the
// derived algorithm, not copied.
//
// Build: make -C native   (produces libparagraph_sw.so)

#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kGapOpen = 6;
constexpr int kGapExtend = 1;
constexpr int kMatch = 1;
constexpr int kMismatch = 4;

inline int nt_class(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return 4;
  }
}

inline int score_of(int ref_c, int read_c) {
  if (ref_c == 4 || read_c == 4) return 0;
  return ref_c == read_c ? kMatch : -kMismatch;
}

struct Node {
  std::string seq;          // uppercased
  std::vector<int> preds;   // sorted ids
};

struct GraphCtx {
  std::vector<Node> nodes;
};

struct NodeFill {
  // matrices are [len][m_pad] but we expose only [.][m_real] to traceback
  std::vector<int32_t> H, E, F;   // len * m_pad
  std::vector<int32_t> last_H;    // m_pad
  std::vector<int32_t> next_E;    // m_pad
  int score1 = 0;
  int ref_end1 = -1;
  int read_end1 = -1;
};

struct FillResult {
  std::vector<NodeFill> fills;
  int max_node = 0;
  int max_score = 0;
  int m_real = 0;
  int m_pad = 0;
};

// Fill all nodes in topological order with cross-node seeding
// (elementwise max over predecessors' boundary states), including the
// striped padding-lane semantics (read padded to 16-lane stripes with
// score-0 positions).
void fill_graph(const GraphCtx& g, const char* read, int m_real,
                FillResult* out) {
  const int m_pad = ((m_real + 15) / 16) * 16;
  out->m_real = m_real;
  out->m_pad = m_pad;
  std::vector<int> read_c(m_pad, 4);
  bool read_has_pad = m_pad > m_real;
  std::vector<bool> is_pad(m_pad, false);
  for (int j = 0; j < m_real; ++j) read_c[j] = nt_class(read[j]);
  for (int j = m_real; j < m_pad; ++j) is_pad[j] = true;

  const size_t n = g.nodes.size();
  out->fills.clear();
  out->fills.resize(n);
  out->max_node = 0;
  out->max_score = 0;
  bool have_max = false;

  std::vector<int32_t> seed_H(m_pad), seed_E(m_pad);
  std::vector<int32_t> hcol(m_pad), ecol(m_pad), fcol(m_pad), hp(m_pad);

  for (size_t nid = 0; nid < n; ++nid) {
    const Node& node = g.nodes[nid];
    NodeFill& f = out->fills[nid];
    const int len = (int)node.seq.size();
    f.H.assign((size_t)len * m_pad, 0);
    f.E.assign((size_t)len * m_pad, 0);
    f.F.assign((size_t)len * m_pad, 0);

    if (node.preds.empty()) {
      std::fill(seed_H.begin(), seed_H.end(), 0);
      std::fill(seed_E.begin(), seed_E.end(), 0);
    } else {
      const NodeFill& p0 = out->fills[node.preds[0]];
      seed_H = p0.last_H;
      seed_E = p0.next_E;
      for (size_t k = 1; k < node.preds.size(); ++k) {
        const NodeFill& pk = out->fills[node.preds[k]];
        for (int j = 0; j < m_pad; ++j) {
          seed_H[j] = std::max(seed_H[j], pk.last_H[j]);
          seed_E[j] = std::max(seed_E[j], pk.next_E[j]);
        }
      }
    }

    std::vector<int32_t>& h_prev = seed_H;
    ecol = seed_E;
    int score1 = 0, ref_end1 = -1, read_end1 = m_real - 1;
    std::vector<int32_t> best_col;

    for (int i = 0; i < len; ++i) {
      const int rc = nt_class(node.seq[(size_t)i]);
      int32_t* Hrow = &f.H[(size_t)i * m_pad];
      int32_t* Erow = &f.E[(size_t)i * m_pad];
      int32_t* Frow = &f.F[(size_t)i * m_pad];
      // H' = max(0, diag + s, E); then F prefix; H = max(H', F)
      int32_t fval = 0;  // F(i,0) = 0
      int col_max = 0;
      for (int j = 0; j < m_pad; ++j) {
        const int s = is_pad[j] ? 0 : score_of(rc, read_c[j]);
        const int32_t diag = j > 0 ? h_prev[j - 1] : 0;
        int32_t hpv = diag + s;
        if (hpv < 0) hpv = 0;
        if (ecol[j] > hpv) hpv = ecol[j];
        if (j > 0) {
          // F(i,j) = max(0, F(i,j-1)-gapE, H(i,j-1)-gapO); H here is the
          // final previous-j H, which the sequential order provides
          int32_t fv = std::max(fval - kGapExtend, Hrow[j - 1] - kGapOpen);
          fval = fv > 0 ? fv : 0;
        } else {
          fval = 0;
        }
        int32_t hv = hpv > fval ? hpv : fval;
        Hrow[j] = hv;
        Erow[j] = ecol[j];
        Frow[j] = fval;
        if (hv > col_max) col_max = hv;
      }
      // E for next column
      for (int j = 0; j < m_pad; ++j) {
        int32_t ev = std::max(ecol[j] - kGapExtend, Hrow[j] - kGapOpen);
        ecol[j] = ev > 0 ? ev : 0;
      }
      h_prev.assign(Hrow, Hrow + m_pad);
      if (col_max > score1) {
        score1 = col_max;
        ref_end1 = i;
        best_col.assign(Hrow, Hrow + m_pad);
      }
    }
    if (!best_col.empty()) {
      for (int j = 0; j < m_pad; ++j) {
        if (best_col[j] == score1 && j < read_end1) {
          read_end1 = j;
          break;
        }
      }
    } else if (m_real > 1) {
      read_end1 = 0;  // all-zero fill: gssw scans its zeroed pvHmax
    }
    f.last_H = h_prev;
    f.next_E = ecol;
    f.score1 = score1;
    f.ref_end1 = ref_end1;
    f.read_end1 = read_end1;
    if (!have_max || score1 > out->max_score) {
      out->max_node = (int)nid;
      out->max_score = score1;
      have_max = true;
    }
  }
}

bool ends_at_multiple_nodes(const FillResult& r) {
  int seen = 0;
  for (const NodeFill& f : r.fills) {
    bool any = false;
    const int rows = (int)(f.H.size() / r.m_pad);
    for (int i = 0; i < rows && !any; ++i) {
      const int32_t* row = &f.H[(size_t)i * r.m_pad];
      for (int j = 0; j < r.m_real; ++j) {
        if (row[j] == r.max_score) { any = true; break; }
      }
    }
    if (any && ++seen > 1) return true;
  }
  return false;
}

struct CigOp {
  int len;
  char op;
};

void push_back_op(std::vector<CigOp>* c, char op, int len) {
  if (!c->empty() && c->back().op == op) c->back().len += len;
  else c->push_back({len, op});
}

void push_front_op(std::vector<CigOp>* c, char op, int len) {
  if (!c->empty() && c->front().op == op) c->front().len += len;
  else c->insert(c->begin(), {len, op});
}

struct Mapping {
  int score = 0;
  int position = 0;
  std::vector<int> node_ids;
  std::vector<std::vector<CigOp>> cigars;
};

// Traceback with gssw preference rules: in H diag > F-close > E-close;
// in gaps open > extend; node boundaries crossed via sorted predecessors.
void trace_back(const GraphCtx& g, const FillResult& r, const char* read,
                Mapping* gm) {
  const int m_pad = r.m_pad;
  int n_id = r.max_node;
  const NodeFill* f = &r.fills[n_id];
  int ref_end = f->ref_end1;
  int read_end = f->read_end1;
  int score = 0;
  if (ref_end >= 0 && read_end >= 0)
    score = f->H[(size_t)ref_end * m_pad + read_end];
  gm->score = score;

  std::vector<int> node_ids_rev;
  std::vector<std::vector<CigOp>> cigars_rev;
  bool gap_in_read = false;
  int end_soft_clip = r.m_real - read_end - 1;

  auto H = [&](const NodeFill* nf, int i, int j) {
    return nf->H[(size_t)i * m_pad + j];
  };
  auto E = [&](const NodeFill* nf, int i, int j) {
    return nf->E[(size_t)i * m_pad + j];
  };
  auto F = [&](const NodeFill* nf, int i, int j) {
    return nf->F[(size_t)i * m_pad + j];
  };

  while (score > 0) {
    f = &r.fills[n_id];
    const std::string& nseq = g.nodes[n_id].seq;
    std::vector<CigOp> cig;
    int i = ref_end, j = read_end;
    bool g_read = gap_in_read, g_ref = false;
    int score_here = g_read ? E(f, i, j) : H(f, i, j);

    while (score_here > 0 && i >= 0 && j >= 0) {
      if (g_read) {
        if (i > 0) {
          if (score_here == H(f, i - 1, j) - kGapOpen) {
            push_back_op(&cig, 'D', 1);
            score_here += kGapOpen;
            --i;
            g_read = false;
            continue;
          }
          if (score_here == E(f, i - 1, j) - kGapExtend) {
            push_back_op(&cig, 'D', 1);
            score_here += kGapExtend;
            --i;
            continue;
          }
          assert(false && "stuck in read gap");
        }
        break;  // cross node boundary in gap
      }
      if (g_ref) {
        if (j > 0) {
          if (score_here == H(f, i, j - 1) - kGapOpen) {
            push_back_op(&cig, 'I', 1);
            score_here += kGapOpen;
            --j;
            g_ref = false;
            continue;
          }
          if (score_here == F(f, i, j - 1) - kGapExtend) {
            push_back_op(&cig, 'I', 1);
            score_here += kGapExtend;
            --j;
            continue;
          }
        }
        assert(false && "stuck in ref gap");
      }
      const char rc = nseq[(size_t)i];
      const char qc = read[j];
      const int a = score_of(nt_class(rc), nt_class(qc));
      bool found = false;
      if (i > 0 && j > 0) {
        if (score_here == H(f, i - 1, j - 1) + a) {
          push_back_op(&cig, (rc == 'N' || qc == 'N') ? 'N'
                              : (rc == qc ? 'M' : 'X'), 1);
          score_here -= a;
          --i;
          --j;
          found = true;
        }
      } else {
        if (score_here == a) {
          if (rc == 'N' || qc == 'N') push_back_op(&cig, 'N', 1);
          else if (rc == qc) push_back_op(&cig, 'M', 1);
          score_here -= a;
          --i;
          --j;
          found = true;
        }
      }
      if (found) continue;
      if (j > 0 && score_here == F(f, i, j)) { g_ref = true; continue; }
      if (score_here == E(f, i, j)) { g_read = true; continue; }
      if (i == 0) break;  // cross node boundary diagonally
      assert(false && "stuck in main matrix");
    }

    std::reverse(cig.begin(), cig.end());
    // merge equal neighbours after reversal
    std::vector<CigOp> merged;
    for (const CigOp& op : cig) push_back_op(&merged, op.op, op.len);
    cig.swap(merged);

    if (end_soft_clip) {
      push_back_op(&cig, 'S', end_soft_clip);
      end_soft_clip = 0;
    }
    node_ids_rev.push_back(n_id);
    cigars_rev.push_back(cig);

    ref_end = i;
    read_end = j;
    gap_in_read = g_read;
    score = score_here;
    if (score != 0 && ref_end > 0) assert(false && "stopped mid-matrix");
    if (score == 0) {
      if (read_end > -1) push_front_op(&cigars_rev.back(), 'S', read_end + 1);
      break;
    }

    int best_prev = -1;
    for (int cn : g.nodes[n_id].preds) {
      const NodeFill* cf = &r.fills[cn];
      const int last = (int)g.nodes[cn].seq.size() - 1;
      if (!gap_in_read) {
        if (read_end > 0) {
          const char rc = nseq[(size_t)ref_end];
          const char qc = read[read_end];
          const int a = score_of(nt_class(rc), nt_class(qc));
          if (score == H(cf, last, read_end - 1) + a) {
            best_prev = cn;
            push_front_op(&cigars_rev.back(),
                          (rc == 'N' || qc == 'N') ? 'N'
                           : (rc == qc ? 'M' : 'X'), 1);
            score -= a;
            --read_end;
            break;
          }
        }
      } else {
        if (score == H(cf, last, read_end) - kGapOpen) {
          best_prev = cn;
          push_front_op(&cigars_rev.back(), 'D', 1);
          score += kGapOpen;
          gap_in_read = false;
          break;
        }
        if (score == E(cf, last, read_end) - kGapExtend) {
          best_prev = cn;
          push_front_op(&cigars_rev.back(), 'D', 1);
          score += kGapExtend;
          break;
        }
      }
    }
    if (best_prev < 0) {
      assert(score == 0 && "no valid previous node");
      if (read_end > -1) push_front_op(&cigars_rev.back(), 'S', read_end + 1);
      break;
    }
    n_id = best_prev;
    ref_end = (int)g.nodes[n_id].seq.size() - 1;
  }

  gm->position = ref_end + 1 >= 0 ? ref_end + 1 : 0;
  gm->node_ids.assign(node_ids_rev.rbegin(), node_ids_rev.rend());
  gm->cigars.assign(cigars_rev.rbegin(), cigars_rev.rend());
}

std::string cigar_string(const Mapping& gm) {
  std::string out;
  char buf[32];
  for (size_t k = 0; k < gm.node_ids.size(); ++k) {
    snprintf(buf, sizeof(buf), "%d[", gm.node_ids[k]);
    out += buf;
    for (const CigOp& op : gm.cigars[k]) {
      snprintf(buf, sizeof(buf), "%d%c", op.len, op.op);
      out += buf;
    }
    out += "]";
  }
  return out;
}

}  // namespace

extern "C" {

void* gsw_create(int n_nodes, const char** seqs, const int* pred_offsets,
                 const int* preds) {
  GraphCtx* g = new GraphCtx();
  g->nodes.resize((size_t)n_nodes);
  for (int i = 0; i < n_nodes; ++i) {
    Node& node = g->nodes[(size_t)i];
    node.seq = seqs[i];
    for (char& c : node.seq) c = (char)toupper((unsigned char)c);
    for (int k = pred_offsets[i]; k < pred_offsets[i + 1]; ++k) {
      node.preds.push_back(preds[k]);
    }
    std::sort(node.preds.begin(), node.preds.end());
  }
  return g;
}

void gsw_destroy(void* ctx) { delete (GraphCtx*)ctx; }

// Fill + traceback + uniqueness on one read. Returns 0 on success.
// cigar_buf receives the node-CIGAR string ("0[4S10M]1[...]").
int gsw_align(void* ctx, const char* read, int read_len, int* score,
              int* position, int* multi, char* cigar_buf,
              int cigar_buf_size) {
  GraphCtx* g = (GraphCtx*)ctx;
  std::string upper(read, (size_t)read_len);
  for (char& c : upper) c = (char)toupper((unsigned char)c);
  FillResult r;
  fill_graph(*g, upper.c_str(), read_len, &r);
  Mapping gm;
  trace_back(*g, r, upper.c_str(), &gm);
  *score = r.max_score;
  *position = gm.position;
  *multi = ends_at_multiple_nodes(r) ? 1 : 0;
  std::string cig = cigar_string(gm);
  if ((int)cig.size() + 1 > cigar_buf_size) return -1;
  memcpy(cigar_buf, cig.c_str(), cig.size() + 1);
  return 0;
}

// Score-only fill (no traceback): returns max score and multi flag.
int gsw_score(void* ctx, const char* read, int read_len, int* score,
              int* multi) {
  GraphCtx* g = (GraphCtx*)ctx;
  std::string upper(read, (size_t)read_len);
  for (char& c : upper) c = (char)toupper((unsigned char)c);
  FillResult r;
  fill_graph(*g, upper.c_str(), read_len, &r);
  *score = r.max_score;
  *multi = ends_at_multiple_nodes(r) ? 1 : 0;
  return 0;
}

}  // extern "C"
