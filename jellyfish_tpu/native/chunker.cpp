// Native FASTA/FASTQ chunk scanner — the host-side hot path.
//
// Role of the reference's mer_overlap_sequence_parser/whole_sequence_parser
// (+ cooperative_pool2): turn sequence streams into fixed-size uint8 chunks
// for the device pipeline with
//   - a separator byte between reads (no mer spans two reads;
//     mer_overlap_sequence_parser.hpp:88 'N'-insertion convention),
//   - a k-1 byte seam carried between consecutive chunks of one stream
//     (mer_overlap_sequence_parser.hpp:164-216),
//   - optional quality masking: bases with qual < min become 'N'
//     (mer_qual_iterator.hpp:74-84),
//   - DOS line endings and multi-line records tolerated
//     (mer_overlap_sequence_parser.hpp:266-287).
//
// Push-based FSM: python feeds raw bytes (it owns file/gzip/pipe IO),
// C++ does all per-byte work and chunk assembly. Exposed via a C ABI for
// ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <new>
#include <vector>

namespace {

constexpr uint8_t SEP = 'N';

enum class Fmt : uint8_t { UNKNOWN, FASTA, FASTQ };

enum class St : uint8_t {
  START,        // expecting '>' or '@'
  HEADER,       // skipping a header line
  SEQ,          // consuming sequence lines (FASTA: until '>', FASTQ: until '+')
  PLUS,         // skipping the FASTQ '+' line
  QUAL,         // consuming quality bytes (counted against seq length)
};

struct Chunker {
  int      k;
  long     chunk_len;
  int      min_qual;       // -1: no quality filtering
  Fmt      fmt = Fmt::UNKNOWN;
  St       st = St::START;
  bool     at_line_start = true;
  uint64_t reads = 0;

  // current chunk under construction
  std::vector<uint8_t> buf;
  long fill = 0;
  bool wrote_any_base = false;   // current read contributed bytes to buf

  // FASTQ quality handling: sequence bytes of the current read are staged
  // until their quality bytes arrive, then masked and emitted.
  std::vector<uint8_t> seq_stage;
  size_t qual_seen = 0;

  std::deque<std::vector<uint8_t>> ready;

  explicit Chunker(int k_, long len, int mq)
      : k(k_), chunk_len(len), min_qual(mq) {
    buf.assign(chunk_len, SEP);
  }

  void emit_chunk_mid_read() {
    // chunk is full mid-read: publish it and seam-carry the last k-1 bytes
    ready.emplace_back(std::move(buf));
    const std::vector<uint8_t>& old = ready.back();
    buf.assign(chunk_len, SEP);
    if (k > 1) {
      std::memcpy(buf.data(), old.data() + chunk_len - (k - 1), k - 1);
      fill = k - 1;
    } else {
      fill = 0;
    }
  }

  void emit_chunk_between_reads() {
    ready.emplace_back(std::move(buf));
    buf.assign(chunk_len, SEP);
    fill = 0;
  }

  inline void push_base(uint8_t b) {
    if (fill >= chunk_len) emit_chunk_mid_read();
    buf[fill++] = b;
    wrote_any_base = true;
  }

  void end_read() {
    if (!wrote_any_base) return;
    reads++;
    wrote_any_base = false;
    if (fill >= chunk_len) {
      // exactly full of this read's end: next read starts a fresh chunk
      emit_chunk_between_reads();
    } else {
      buf[fill++] = SEP;  // separator breaks mers to the next read
    }
  }

  void flush_fastq_read() {
    // emit staged sequence with quality mask applied
    for (uint8_t b : seq_stage) push_base(b);
    seq_stage.clear();
    qual_seen = 0;
    end_read();
  }

  void feed(const uint8_t* p, long n) {
    const uint8_t* end = p + n;
    while (p < end) {
      uint8_t c = *p;
      switch (st) {
        case St::START: {
          if (c == '>') { fmt = Fmt::FASTA; st = St::HEADER; p++; }
          else if (c == '@') { fmt = Fmt::FASTQ; st = St::HEADER; p++; }
          else p++;  // skip blank/garbage between records
          break;
        }
        case St::HEADER: {
          const uint8_t* nl = static_cast<const uint8_t*>(
              std::memchr(p, '\n', end - p));
          if (!nl) { p = end; break; }
          p = nl + 1;
          st = St::SEQ;
          at_line_start = true;
          break;
        }
        case St::SEQ: {
          if (at_line_start) {
            if (fmt == Fmt::FASTA && c == '>') {
              end_read(); st = St::HEADER; p++; break;
            }
            if (fmt == Fmt::FASTQ && c == '+') {
              st = St::PLUS; p++; break;
            }
          }
          if (c == '\n') { at_line_start = true; p++; break; }
          if (c == '\r') { p++; break; }
          at_line_start = false;
          // consume a run of sequence bytes up to newline/end
          const uint8_t* nl = static_cast<const uint8_t*>(
              std::memchr(p, '\n', end - p));
          const uint8_t* stop = nl ? nl : end;
          if (fmt == Fmt::FASTQ && min_qual >= 0) {
            seq_stage.insert(seq_stage.end(), p, stop);
            // strip any trailing \r lazily when quality masks are applied:
            while (!seq_stage.empty() && seq_stage.back() == '\r')
              seq_stage.pop_back();
          } else if (fmt == Fmt::FASTQ) {
            for (const uint8_t* q = p; q < stop; ++q)
              if (*q != '\r') { push_base(*q); seq_stage.push_back(0); }
            // seq_stage tracks length only (zeros) for qual accounting
          } else {
            for (const uint8_t* q = p; q < stop; ++q)
              if (*q != '\r') push_base(*q);
          }
          p = stop;
          break;
        }
        case St::PLUS: {
          const uint8_t* nl = static_cast<const uint8_t*>(
              std::memchr(p, '\n', end - p));
          if (!nl) { p = end; break; }
          p = nl + 1;
          st = St::QUAL;
          break;
        }
        case St::QUAL: {
          if (c == '\n' || c == '\r') { p++; break; }
          const uint8_t* nl = static_cast<const uint8_t*>(
              std::memchr(p, '\n', end - p));
          const uint8_t* stop = nl ? nl : end;
          long take = stop - p;
          if (p < stop && stop[-1] == '\r') take--;
          long need = static_cast<long>(seq_stage.size() - qual_seen);
          if (take > need) take = need;
          if (min_qual >= 0) {
            for (long i = 0; i < take; ++i)
              if (p[i] < static_cast<uint8_t>(min_qual))
                seq_stage[qual_seen + i] = SEP;
          }
          qual_seen += take;
          p = stop;
          if (qual_seen >= seq_stage.size()) {
            if (min_qual >= 0) flush_fastq_read();
            else { seq_stage.clear(); qual_seen = 0; end_read(); }
            st = St::START;
          }
          break;
        }
      }
    }
  }

  void end_stream() {
    // EOF inside a record: finish whatever is staged
    if (st == St::QUAL || (fmt == Fmt::FASTQ && min_qual >= 0 &&
                           !seq_stage.empty())) {
      if (min_qual >= 0) flush_fastq_read();
      else { seq_stage.clear(); qual_seen = 0; end_read(); }
    } else {
      seq_stage.clear();
      qual_seen = 0;
      end_read();
    }
    st = St::START;
    fmt = Fmt::UNKNOWN;
    at_line_start = true;
  }

  // final partial chunk (if it holds any content)
  bool finish(uint8_t* out) {
    end_stream();
    if (!ready.empty() || fill > 0) {
      if (fill > 0) {
        std::memcpy(out, buf.data(), chunk_len);
        buf.assign(chunk_len, SEP);
        fill = 0;
        return true;
      }
    }
    return false;
  }
};

}  // namespace

extern "C" {

Chunker* jf_chunker_new(int k, long chunk_len, int min_qual) {
  return new (std::nothrow) Chunker(k, chunk_len, min_qual);
}

void jf_chunker_free(Chunker* c) { delete c; }

void jf_chunker_feed(Chunker* c, const uint8_t* data, long n) {
  c->feed(data, n);
}

void jf_chunker_end_stream(Chunker* c) { c->end_stream(); }

// pop one ready chunk into out[chunk_len]; returns 1 if popped
int jf_chunker_pop(Chunker* c, uint8_t* out) {
  if (c->ready.empty()) return 0;
  std::memcpy(out, c->ready.front().data(), c->chunk_len);
  c->ready.pop_front();
  return 1;
}

int jf_chunker_finish(Chunker* c, uint8_t* out) {
  return c->finish(out) ? 1 : 0;
}

unsigned long long jf_chunker_reads(Chunker* c) { return c->reads; }

// Pack an ASCII chunk into the device's native input layout:
//   pwords[L/16]: 2-bit codes, 16 bases per u32, big-endian within the
//                 word (A=0 C=1 G=2 T=3; the (ch>>1)&3 + Gray-swap trick)
//   validbits[L/32]: bit i (little-endian within words) = base i is ACGT
// This removes the device-side encode pass and cuts host->device traffic
// 4.25x (0.28 bytes/base instead of 1).
void jf_pack_chunk(const uint8_t* chunk, long L, uint32_t* pwords,
                   uint32_t* validbits) {
  long nw = L / 16;
  for (long j = 0; j < nw; ++j) {
    uint32_t w = 0;
    const uint8_t* p = chunk + 16 * j;
    for (int t = 0; t < 16; ++t) {
      uint8_t b = (p[t] >> 1) & 3;
      b ^= b >> 1;
      w |= static_cast<uint32_t>(b) << (2 * (15 - t));
    }
    pwords[j] = w;
  }
  long nv = L / 32;
  for (long j = 0; j < nv; ++j) {
    uint32_t v = 0;
    const uint8_t* p = chunk + 32 * j;
    for (int t = 0; t < 32; ++t) {
      uint8_t lower = p[t] | 0x20;
      bool ok = lower == 'a' || lower == 'c' || lower == 'g' || lower == 't';
      v |= static_cast<uint32_t>(ok) << t;
    }
    validbits[j] = v;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------
// rANS 4x8 block decoder (CRAM compression method 4) — the hot inner
// loop of native CRAM reading (io/rans.py holds the reference
// implementation and fallback). Returns decoded length, or -1 on any
// malformed input (caller falls back to python for exact errors).

namespace {

struct RansIn {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
  uint8_t u8() {
    if (p >= end) {
      ok = false;
      return 0;
    }
    return *p++;
  }
};

constexpr uint32_t kRansL = 1u << 23;
constexpr uint32_t kTotFreq = 1u << 12;

struct RansTable {
  // per 12-bit slot: symbol, its frequency and cumulative start
  uint8_t sym[kTotFreq];
  uint16_t freq[kTotFreq];
  uint16_t cum[kTotFreq];
};

static bool read_freqs0(RansIn& in, uint32_t f[256]) {
  std::memset(f, 0, 256 * sizeof(uint32_t));
  int sym = in.u8();
  int last = sym;
  int rle = 0;
  while (in.ok) {
    uint32_t v = in.u8();
    if (v >= 0x80) v = ((v & 0x7F) << 8) | in.u8();
    if (sym > 255) return false;
    f[sym] = v;
    if (rle > 0) {
      --rle;
      ++sym;
    } else {
      sym = in.u8();
      if (sym == last + 1) rle = in.u8();
    }
    last = sym;
    if (sym == 0) break;
  }
  return in.ok;
}

static bool build_table(const uint32_t f[256], RansTable& t) {
  uint32_t c = 0;
  for (int s = 0; s < 256; ++s) {
    if (!f[s]) continue;
    if (c + f[s] > kTotFreq) return false;
    for (uint32_t i = 0; i < f[s]; ++i) {
      t.sym[c + i] = static_cast<uint8_t>(s);
      t.freq[c + i] = static_cast<uint16_t>(f[s]);
      t.cum[c + i] = static_cast<uint16_t>(c);
    }
    c += f[s];
  }
  return true;
}

static bool rans_u32x4(RansIn& in, uint32_t x[4]) {
  for (int j = 0; j < 4; ++j) {
    if (in.end - in.p < 4) return false;
    x[j] = static_cast<uint32_t>(in.p[0]) | in.p[1] << 8 | in.p[2] << 16 |
           static_cast<uint32_t>(in.p[3]) << 24;
    in.p += 4;
  }
  return true;
}

static long rans_decode0(RansIn& in, uint8_t* out, long n) {
  uint32_t f[256];
  if (!read_freqs0(in, f)) return -1;
  auto t = std::make_unique<RansTable>();
  if (!build_table(f, *t)) return -1;
  uint32_t x[4];
  if (!rans_u32x4(in, x)) return -1;
  for (long i = 0; i < n; ++i) {
    uint32_t& s = x[i & 3];
    uint32_t m = s & (kTotFreq - 1);
    out[i] = t->sym[m];
    s = t->freq[m] * (s >> 12) + m - t->cum[m];
    while (s < kRansL) {
      if (in.p >= in.end) return -1;
      s = (s << 8) | *in.p++;
    }
  }
  return n;
}

static long rans_decode1(RansIn& in, uint8_t* out, long n) {
  std::vector<std::unique_ptr<RansTable>> tabs(256);
  {
    int ctx = in.u8();
    int last = ctx;
    int rle = 0;
    while (in.ok) {
      uint32_t f[256];
      if (ctx > 255 || !read_freqs0(in, f)) return -1;
      tabs[ctx] = std::make_unique<RansTable>();
      if (!build_table(f, *tabs[ctx])) return -1;
      if (rle > 0) {
        --rle;
        ++ctx;
      } else {
        ctx = in.u8();
        if (ctx == last + 1) rle = in.u8();
      }
      last = ctx;
      if (ctx == 0) break;
    }
    if (!in.ok) return -1;
  }
  uint32_t x[4];
  if (!rans_u32x4(in, x)) return -1;
  const long q = n >> 2;
  long pos[4] = {0, q, 2 * q, 3 * q};
  uint8_t ctxs[4] = {0, 0, 0, 0};
  auto step = [&](int j, long at) -> bool {
    RansTable* t = tabs[ctxs[j]].get();
    if (!t) return false;
    uint32_t& s = x[j];
    uint32_t m = s & (kTotFreq - 1);
    uint8_t sym = t->sym[m];
    out[at] = sym;
    s = t->freq[m] * (s >> 12) + m - t->cum[m];
    while (s < kRansL) {
      if (in.p >= in.end) return false;
      s = (s << 8) | *in.p++;
    }
    ctxs[j] = sym;
    return true;
  };
  for (long i = 0; i < q; ++i)
    for (int j = 0; j < 4; ++j)
      if (!step(j, pos[j] + i)) return -1;
  for (long i = 4 * q; i < n; ++i)
    if (!step(3, i)) return -1;
  return n;
}

}  // namespace

// data = full block: [order u8][comp_size u32le][raw_size u32le][payload]
extern "C" long jf_rans_decode(const uint8_t* data, long len, uint8_t* out,
                               long out_cap) {
  if (len < 9) return -1;
  const uint8_t order = data[0];
  uint32_t comp_size, raw_size;
  std::memcpy(&comp_size, data + 1, 4);
  std::memcpy(&raw_size, data + 5, 4);
  if (static_cast<long>(raw_size) > out_cap) return -1;
  if (9 + static_cast<long>(comp_size) > len) return -1;
  if (raw_size == 0) return 0;
  RansIn in{data + 9, data + 9 + comp_size};
  if (order == 0) return rans_decode0(in, out, raw_size);
  if (order == 1) return rans_decode1(in, out, raw_size);
  return -1;
}
