// CPU baseline measurement harness (NOT part of the framework).
//
// Drives the UPSTREAM reference's own hot counting path — stream_manager
// -> mer_overlap_sequence_parser -> mer_iterator -> cooperative
// hash_counter CAS inserts (count_main.cc:152-184 is the production
// driver of the same API) — so the "32-thread CPU jellyfish" baseline in
// bench.py can be anchored to a real measurement of the reference's code
// on this host instead of a guessed constant (VERDICT weak #5).
//
// Build (see experiments/ref_cpu_bench.sh):
//   g++ -std=c++11 -O3 -DHAVE_CONFIG_H -I<cfgdir> -I/root/reference/include \
//       ref_cpu_bench.cc <reference lib/ TUs> -lpthread
//
// Usage: ref_cpu_bench <fasta/fastq> <k> <size> <threads> [canonical=1]
// Prints one JSON line: {"mers": N, "seconds": S, "mers_per_sec": R, ...}

#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include <jellyfish/jellyfish.hpp>
#include <jellyfish/mer_overlap_sequence_parser.hpp>
#include <jellyfish/mer_iterator.hpp>
#include <jellyfish/stream_manager.hpp>
#include <jellyfish/thread_exec.hpp>

using jellyfish::mer_dna;

typedef std::vector<const char*> path_vec;
typedef jellyfish::stream_manager<path_vec::const_iterator> streams_t;
typedef jellyfish::mer_overlap_sequence_parser<streams_t> parser_t;
typedef jellyfish::mer_iterator<parser_t, mer_dna> mer_iter_t;

namespace {

class bench_counter : public jellyfish::thread_exec {
public:
  bench_counter(int threads, mer_hash& ary, streams_t& streams, bool canon)
      : ary_(ary),
        parser_(mer_dna::k(), streams.nb_streams(), 3 * threads, 4096,
                streams),
        canonical_(canon),
        total_mers_(0) {
    ary_.reset_done();
  }

  virtual void start(int thid) {
    size_t n = 0;
    for(mer_iter_t mers(parser_, canonical_); mers; ++mers) {
      ary_.add(*mers, 1);
      ++n;
    }
    ary_.done();
    total_mers_ += n;
  }

  size_t total_mers() const { return total_mers_.load(); }

private:
  mer_hash& ary_;
  parser_t parser_;
  bool canonical_;
  std::atomic<size_t> total_mers_;
};

}  // namespace

int main(int argc, char** argv) {
  if(argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <seq-file> <k> <size> <threads> [canonical]\n",
                 argv[0]);
    return 1;
  }
  const char* path = argv[1];
  const int k = std::atoi(argv[2]);
  const size_t size = std::strtoull(argv[3], nullptr, 0);
  const int threads = std::atoi(argv[4]);
  const bool canonical = argc > 5 ? std::atoi(argv[5]) != 0 : true;

  mer_dna::k(k);
  path_vec files{path};
  streams_t streams(files.begin(), files.end(), 1);

  // same defaults as the reference CLI: 7-bit counters, 126 reprobes
  mer_hash ary(size, 2 * k, 7, threads, 126);

  bench_counter counter(threads, ary, streams, canonical);
  auto t0 = std::chrono::steady_clock::now();
  counter.exec_join(threads);
  auto t1 = std::chrono::steady_clock::now();

  const double secs = std::chrono::duration<double>(t1 - t0).count();
  const size_t mers = counter.total_mers();
  std::printf(
      "{\"mers\": %zu, \"seconds\": %.4f, \"mers_per_sec\": %.1f, "
      "\"threads\": %d, \"k\": %d, \"canonical\": %d}\n",
      mers, secs, mers / secs, threads, k, canonical ? 1 : 0);
  return 0;
}
