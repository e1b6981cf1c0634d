// ThreadSanitizer harness for the native graph-SW engine.
//
// The production fan-out (align/batched_aligner.py:193-216) gives every
// worker thread its own gsw context because gsw_align reuses a
// per-context fill scratch (graph_sw.cpp ctx_scratch). This driver
// replays that exact pattern under -fsanitize=thread — N threads, each
// with a private context over the same graph, aligning interleaved
// slices of one read set — and additionally checks determinism: every
// thread's results must equal a serial reference run. TSan reports
// abort the run (halt_on_error), so a data race fails the build's race
// test the same way the reference's valgrind docker gates its threaded
// paths (/root/reference/src/docker-testing/valgrind-testing.sh,
// test_multithreading.cpp).
//
// Build + run:  make -C native race_test && ./native/race_test
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* gsw_create(int n_nodes, const char** seqs, const int* pred_offsets,
                 const int* preds);
void gsw_destroy(void* ctx);
int gsw_align(void* ctx, const char* read, int read_len, int* score,
              int* position, int* multi, char* cigar_buf,
              int cigar_buf_size);
}

namespace {

struct AlignOut {
  int score = -1;
  int position = -1;
  int multi = -1;
  std::string cigar;
};

void* make_graph() {
  // LF -> {MID, DEL-skip} -> RF: the short-deletion template shape
  static const char* seqs[3] = {
      "ACGTACGTACGTTTGACCA", "GGTTGGAACC", "TTCAGGCATGCATG"};
  static const int pred_offsets[4] = {0, 0, 1, 3};
  static const int preds[3] = {0, 0, 1};
  return gsw_create(3, seqs, pred_offsets, preds);
}

std::vector<std::string> make_reads() {
  std::vector<std::string> reads;
  const std::string ref = "ACGTACGTACGTTTGACCAGGTTGGAACCTTCAGGCATGCATG";
  const std::string del = "ACGTACGTACGTTTGACCATTCAGGCATGCATG";
  for (int i = 0; i + 20 <= (int)ref.size(); i += 3)
    reads.push_back(ref.substr((size_t)i, 20));
  for (int i = 0; i + 18 <= (int)del.size(); i += 2)
    reads.push_back(del.substr((size_t)i, 18));
  // a mismatching read and an empty-score read
  reads.push_back("TTTTTTTTTTTTTTTTTT");
  reads.push_back("ACGTACGTACGTTAGACCA");  // 1 mismatch
  return reads;
}

AlignOut run_one(void* ctx, const std::string& read) {
  AlignOut o;
  char buf[512];
  if (gsw_align(ctx, read.c_str(), (int)read.size(), &o.score, &o.position,
                &o.multi, buf, sizeof buf) == 0)
    o.cigar = buf;
  return o;
}

}  // namespace

int main(int argc, char** argv) {
  const auto reads = make_reads();
  const int kThreads = 8;
  const int kRounds = 50;
  // negative control: --shared-ctx makes every thread reuse ONE context
  // (the pattern the production code deliberately avoids); TSan must
  // report the scratch race, proving the harness can actually detect one
  const bool shared_ctx = argc > 1 && !std::strcmp(argv[1], "--shared-ctx");

  // serial oracle
  void* ref_ctx = make_graph();
  std::vector<AlignOut> want;
  want.reserve(reads.size());
  for (const auto& r : reads) want.push_back(run_one(ref_ctx, r));
  gsw_destroy(ref_ctx);

  int bad = 0;
  void* one_ctx = shared_ctx ? make_graph() : nullptr;
  std::vector<std::thread> pool;
  pool.reserve(kThreads);
  for (int t = 0; t < kThreads; ++t) {
    pool.emplace_back([&, t] {
      // private context per thread (production pattern) unless the
      // negative control asked for the racy shared one
      void* ctx = shared_ctx ? one_ctx : make_graph();
      for (int round = 0; round < kRounds; ++round) {
        for (size_t i = (size_t)t; i < reads.size(); i += kThreads) {
          AlignOut got = run_one(ctx, reads[i]);
          if (shared_ctx) continue;  // results undefined under the race
          if (got.score != want[i].score ||
              got.position != want[i].position ||
              got.multi != want[i].multi || got.cigar != want[i].cigar) {
            std::fprintf(stderr,
                         "thread %d read %zu: got (%d,%d,%d,%s) want "
                         "(%d,%d,%d,%s)\n",
                         t, i, got.score, got.position, got.multi,
                         got.cigar.c_str(), want[i].score, want[i].position,
                         want[i].multi, want[i].cigar.c_str());
            __atomic_fetch_add(&bad, 1, __ATOMIC_RELAXED);
          }
        }
      }
      if (!shared_ctx) gsw_destroy(ctx);
    });
  }
  for (auto& th : pool) th.join();
  if (one_ctx) gsw_destroy(one_ctx);

  if (bad) {
    std::fprintf(stderr, "FAIL: %d mismatches\n", bad);
    return 1;
  }
  std::printf("OK: %zu reads x %d threads x %d rounds race-free and "
              "deterministic\n",
              reads.size(), kThreads, kRounds);
  return 0;
}
