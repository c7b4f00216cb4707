// Reference-interop oracle harness (NOT part of the framework).
//
// Compiled on demand by tests/test_ref_interop.py with g++ against the
// UPSTREAM headers at /root/reference/include and a handful of its lib/
// translation units, so that interop tests exercise the reference's OWN
// hash array, matrix, dumper, header and reader code paths
// (large_hash_array.hpp, binary_dumper.hpp:36-40,103-108,
// file_header.hpp:18-109, generic_file_header.hpp:88-143) against files
// produced by jellyfish_tpu, and vice versa.
//
// Modes:
//   ref_oracle write <out.jf> <k> <size>   reads "MER COUNT" lines on
//       stdin, inserts into a real large_hash::array (random matrix),
//       dumps with binary_dumper in hash order.
//   ref_oracle read <in.jf>                prints "MER COUNT" lines in
//       file order via file_header + binary_reader.
//   ref_oracle header <in.jf>              prints key header fields.
//   ref_oracle count <out.jf> <k> <size> <canonical> <seq-file...>
//       counts a FASTA/FASTQ file through the reference's OWN parser +
//       mer_iterator + hash + dumper (the full `jellyfish count` path).

#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include <jellyfish/jellyfish.hpp>
#include <jellyfish/file_header.hpp>
#include <jellyfish/mer_overlap_sequence_parser.hpp>
#include <jellyfish/mer_iterator.hpp>
#include <jellyfish/mer_qual_iterator.hpp>
#include <jellyfish/stream_manager.hpp>
#include <jellyfish/whole_sequence_parser.hpp>
#include <jellyfish/mapped_file.hpp>
#include <jellyfish/mer_dna_bloom_counter.hpp>
#include <jellyfish/merge_files.hpp>

using jellyfish::file_header;
using jellyfish::mer_dna;

static int do_write(int argc, char** argv) {
  if(argc < 3) { std::cerr << "write <out.jf> <k> <size>\n"; return 1; }
  const char* out = argv[0];
  const int k = atoi(argv[1]);
  const size_t size = strtoull(argv[2], nullptr, 0);
  mer_dna::k(k);

  file_header header;
  header.fill_standard();
  header.canonical(false);

  mer_hash ary(size, 2 * k, 7 /*counter_len bits*/, 1 /*threads*/,
               126 /*reprobes*/);
  std::unique_ptr<jellyfish::dumper_t<mer_array>> dumper(
      new binary_dumper(4 /*out counter bytes*/, ary.key_len(), 1, out,
                        &header));
  ary.dumper(dumper.get());

  std::string mer_s;
  unsigned long long count;
  mer_dna m;
  while(std::cin >> mer_s >> count) {
    m = mer_s.c_str();
    ary.add(m, count);
  }
  dumper->one_file(true);
  dumper->dump(ary.ary());
  return 0;
}

// Full reference counting pipeline on a real sequence file: its own
// stream_manager -> mer_overlap_sequence_parser -> mer_iterator (with
// canonicalization) -> hash -> binary_dumper. This is what `jellyfish
// count -m k -s size [-C] -t 1 -o out file` executes (count_main.cc
// 152-184,330-357) minus the yaggo CLI, so differential tests can compare
// whole-file counting byte-for-byte.
static int do_count(int argc, char** argv) {
  if(argc < 5) {
    std::cerr << "count <out.jf> <k> <size> <canonical 0|1> <seq-file>\n";
    return 1;
  }
  const char* out = argv[0];
  const int k = atoi(argv[1]);
  const size_t size = strtoull(argv[2], nullptr, 0);
  const bool canonical = atoi(argv[3]) != 0;
  mer_dna::k(k);

  typedef std::vector<const char*> path_vec;
  typedef jellyfish::stream_manager<path_vec::const_iterator> streams_t;
  typedef jellyfish::mer_overlap_sequence_parser<streams_t> parser_t;
  typedef jellyfish::mer_iterator<parser_t, mer_dna> mer_iter_t;

  path_vec files(argv + 4, argv + argc);
  streams_t streams(files.begin(), files.end(), 1);

  file_header header;
  header.fill_standard();
  header.canonical(canonical);

  mer_hash ary(size, 2 * k, 7, 1, 126);
  std::unique_ptr<jellyfish::dumper_t<mer_array>> dumper(
      new binary_dumper(4, ary.key_len(), 1, out, &header));
  ary.dumper(dumper.get());

  parser_t parser(mer_dna::k(), streams.nb_streams(), 3, 4096, streams);
  for(mer_iter_t mers(parser, canonical); mers; ++mers)
    ary.add(*mers, 1);
  ary.done();
  dumper->one_file(true);
  dumper->dump(ary.ary());
  return 0;
}

// --if subset counting through the reference's OWN PRIME/UPDATE passes
// (count_main.cc:156-181,288-295): the if-file's mers are claimed with
// set() at count 0, then only update_add() touches them while counting —
// allowed-but-unseen mers stay in the dump with count 0.
static int do_count_if(int argc, char** argv) {
  if(argc < 6) {
    std::cerr << "count-if <out.jf> <k> <size> <canonical 0|1> <if-file> "
                 "<seq-file...>\n";
    return 1;
  }
  const char* out = argv[0];
  const int k = atoi(argv[1]);
  const size_t size = strtoull(argv[2], nullptr, 0);
  const bool canonical = atoi(argv[3]) != 0;
  mer_dna::k(k);

  typedef std::vector<const char*> path_vec;
  typedef jellyfish::stream_manager<path_vec::const_iterator> streams_t;
  typedef jellyfish::mer_overlap_sequence_parser<streams_t> parser_t;
  typedef jellyfish::mer_iterator<parser_t, mer_dna> mer_iter_t;

  file_header header;
  header.fill_standard();
  header.canonical(canonical);

  mer_hash ary(size, 2 * k, 7, 1, 126);
  std::unique_ptr<jellyfish::dumper_t<mer_array>> dumper(
      new binary_dumper(4, ary.key_len(), 1, out, &header));
  ary.dumper(dumper.get());

  {
    path_vec prime_files(argv + 4, argv + 5);
    streams_t streams(prime_files.begin(), prime_files.end(), 1);
    parser_t parser(mer_dna::k(), streams.nb_streams(), 3, 4096, streams);
    for(mer_iter_t mers(parser, canonical); mers; ++mers)
      ary.set(*mers);
  }
  {
    path_vec files(argv + 5, argv + argc);
    streams_t streams(files.begin(), files.end(), 1);
    parser_t parser(mer_dna::k(), streams.nb_streams(), 3, 4096, streams);
    mer_dna tmp;
    for(mer_iter_t mers(parser, canonical); mers; ++mers)
      ary.update_add(*mers, 1, tmp);
  }
  ary.done();
  dumper->one_file(true);
  dumper->dump(ary.ary());
  return 0;
}

// Quality-filtered counting through the reference's OWN whole-sequence
// parser + mer_qual_iterator (count_main.cc:72-94,326-334: bases with
// quality < min are treated as 'N'). FASTQ only.
static int do_count_qual(int argc, char** argv) {
  if(argc < 6) {
    std::cerr << "count-qual <out.jf> <k> <size> <canonical 0|1> "
                 "<min-qual-char> <fastq-file...>\n";
    return 1;
  }
  const char* out = argv[0];
  const int k = atoi(argv[1]);
  const size_t size = strtoull(argv[2], nullptr, 0);
  const bool canonical = atoi(argv[3]) != 0;
  const char min_qual = argv[4][0];
  mer_dna::k(k);

  typedef std::vector<const char*> path_vec;
  typedef jellyfish::stream_manager<path_vec::const_iterator> streams_t;
  typedef jellyfish::whole_sequence_parser<streams_t> qparser_t;
  typedef jellyfish::mer_qual_iterator<qparser_t, mer_dna> qmer_iter_t;

  path_vec files(argv + 5, argv + argc);
  streams_t streams(files.begin(), files.end(), 1);

  file_header header;
  header.fill_standard();
  header.canonical(canonical);

  mer_hash ary(size, 2 * k, 7, 1, 126);
  std::unique_ptr<jellyfish::dumper_t<mer_array>> dumper(
      new binary_dumper(4, ary.key_len(), 1, out, &header));
  ary.dumper(dumper.get());

  qparser_t parser(3, 100, 1, streams);
  for(qmer_iter_t mers(parser, min_qual, canonical); mers; ++mers)
    ary.add(*mers, 1);
  ary.done();
  dumper->one_file(true);
  dumper->dump(ary.ary());
  return 0;
}

// Reference merge_files over same-matrix DBs (merge_files.cc:105-176):
// differential tests feed it OUR --disk partials and byte-compare with
// our own `merge` output.
static int do_merge(int argc, char** argv) {
  if(argc < 4) {
    std::cerr << "merge <out.jf> <sum|min|max|jaccard> <in.jf> <in.jf...>\n";
    return 1;
  }
  const char* out = argv[0];
  std::string opname(argv[1]);
  merge_op op = SUM;
  if(opname == "min") op = MIN;
  else if(opname == "max") op = MAX;
  else if(opname == "jaccard") op = JACCARD;
  else if(opname != "sum") { std::cerr << "bad op " << opname << '\n'; return 1; }
  std::vector<const char*> files(argv + 2, argv + argc);
  jellyfish::file_header header;
  header.fill_standard();
  try {
    merge_files(files, out, header, 0, std::numeric_limits<uint64_t>::max(),
                op);
  } catch(MergeError& e) {
    std::cerr << "MergeError: " << e.what() << '\n';
    return 1;
  }
  return 0;
}

static int do_read(int argc, char** argv) {
  if(argc < 1) { std::cerr << "read <in.jf>\n"; return 1; }
  std::ifstream is(argv[0]);
  if(!is.good()) { std::cerr << "cannot open " << argv[0] << '\n'; return 1; }
  file_header header(is);
  if(header.format() != binary_dumper::format) {
    std::cerr << "unexpected format " << header.format() << '\n';
    return 1;
  }
  mer_dna::k(header.key_len() / 2);
  binary_reader reader(is, &header);
  while(reader.next())
    std::cout << reader.key() << ' ' << reader.val() << '\n';
  return 0;
}

// Stream a "text/sorted" DB through the reference's OWN text_reader
// (text_dumper.hpp:61-77) — validates our --text output end to end.
static int do_read_text(int argc, char** argv) {
  if(argc < 1) { std::cerr << "read-text <in.jf>\n"; return 1; }
  std::ifstream is(argv[0]);
  if(!is.good()) { std::cerr << "cannot open " << argv[0] << '\n'; return 1; }
  file_header header(is);
  if(header.format() != text_dumper::format) {
    std::cerr << "unexpected format " << header.format() << '\n';
    return 1;
  }
  mer_dna::k(header.key_len() / 2);
  text_reader reader(is, &header);
  while(reader.next())
    std::cout << reader.key() << ' ' << reader.val() << '\n';
  return 0;
}

// Random-access lookups through the reference's OWN binary_query backend
// (mmap + interpolated search, binary_dumper.hpp:112-213; what
// `jellyfish query` executes, query_main.cc:109-116). Prints one count
// per mer; canonicalizes when the header says so.
static int do_query(int argc, char** argv) {
  if(argc < 2) { std::cerr << "query <in.jf> <mer...>\n"; return 1; }
  jellyfish::mapped_file map(argv[0]);
  std::ifstream is(argv[0]);
  file_header header(is);
  if(header.format() != binary_dumper::format) {
    std::cerr << "unexpected format " << header.format() << '\n';
    return 1;
  }
  mer_dna::k(header.key_len() / 2);
  binary_query bq(map.base() + header.offset(), header.key_len(),
                  header.counter_len(), header.matrix(),
                  header.size() - 1, map.length() - header.offset());
  mer_dna m;
  for(int i = 1; i < argc; ++i) {
    m = argv[i];
    if(header.canonical()) m.canonicalize();
    std::cout << bq.check(m) << '\n';
  }
  return 0;
}

// Lookups in a "bloomcounter" file through the reference's OWN
// mer_dna_bloom_counter (base-3 packed cells + two-matrix double hashing,
// bloom_counter2.hpp; what `jellyfish query` runs on bc output,
// query_main.cc:99-107). Prints one saturating count {0,1,2} per mer.
static int do_bcquery(int argc, char** argv) {
  if(argc < 2) { std::cerr << "bcquery <in.bc> <mer...>\n"; return 1; }
  std::ifstream in(argv[0]);
  if(!in.good()) { std::cerr << "cannot open " << argv[0] << '\n'; return 1; }
  file_header header(in);
  if(header.format() != "bloomcounter") {
    std::cerr << "unexpected format " << header.format() << '\n';
    return 1;
  }
  mer_dna::k(header.key_len() / 2);
  jellyfish::hash_pair<mer_dna> fns(header.matrix(1), header.matrix(2));
  jellyfish::mer_dna_bloom_counter filter(header.size(), header.nb_hashes(),
                                          in, fns);
  if(!in.good()) { std::cerr << "bloom file truncated\n"; return 1; }
  mer_dna m;
  for(int i = 1; i < argc; ++i) {
    m = argv[i];
    if(header.canonical()) m.canonicalize();
    std::cout << filter.check(m) << '\n';
  }
  return 0;
}

static int do_header(int argc, char** argv) {
  if(argc < 1) { std::cerr << "header <in.jf>\n"; return 1; }
  std::ifstream is(argv[0]);
  file_header header(is);
  std::cout << "format " << header.format() << '\n'
            << "key_len " << header.key_len() << '\n'
            << "val_len " << header.val_len() << '\n'
            << "counter_len " << header.counter_len() << '\n'
            << "size " << header.size() << '\n'
            << "canonical " << (header.canonical() ? 1 : 0) << '\n'
            << "max_reprobe " << header.max_reprobe() << '\n';
  return 0;
}

int main(int argc, char** argv) {
  if(argc < 2) {
    std::cerr << "usage: ref_oracle write|read|header ...\n";
    return 1;
  }
  std::string mode(argv[1]);
  if(mode == "write")  return do_write(argc - 2, argv + 2);
  if(mode == "read")   return do_read(argc - 2, argv + 2);
  if(mode == "read-text") return do_read_text(argc - 2, argv + 2);
  if(mode == "header") return do_header(argc - 2, argv + 2);
  if(mode == "count")  return do_count(argc - 2, argv + 2);
  if(mode == "merge")  return do_merge(argc - 2, argv + 2);
  if(mode == "count-qual") return do_count_qual(argc - 2, argv + 2);
  if(mode == "count-if") return do_count_if(argc - 2, argv + 2);
  if(mode == "query")  return do_query(argc - 2, argv + 2);
  if(mode == "bcquery") return do_bcquery(argc - 2, argv + 2);
  std::cerr << "unknown mode " << mode << '\n';
  return 1;
}
