// Native BAM record scanner: walks raw (decompressed-BGZF) record bytes
// and applies the region/flag prefix filter of BamReader.fetch at C
// speed, so Python only decodes the records that pass.
//
// Host-runtime companion of the read-extraction layer
// (paragraph_tpu/io/bam.py); mirrors the iterator filtering htslib's
// sam_itr_querys applies inside the reference's BamReader
// (/root/reference/src/c++/lib/common/BamReader.cpp) — written against
// the BAM spec, not ported.
//
// Build: make -C native   (linked into libparagraph_sw.so)

#include <cstdint>
#include <cstring>

namespace {

inline int32_t rd_i32(const uint8_t* p) {
  int32_t v;
  memcpy(&v, p, 4);
  return v;  // BAM is little-endian; so are our targets
}

inline uint16_t rd_u16(const uint8_t* p) {
  uint16_t v;
  memcpy(&v, p, 2);
  return v;
}

// CIGAR ops that consume reference: M(0) D(2) N(3) =(7) X(8)
inline bool ref_consume(uint32_t op) {
  return op == 0 || op == 2 || op == 3 || op == 7 || op == 8;
}

}  // namespace

extern "C" {

// Scan records in buf[start..buf_len) and record the byte offsets (of the
// leading block_size field) of records that pass:
//   refid == tid, pos < end, !(flag & exclude_flags),
//   and CIGAR reference span overlapping [beg, end).
// stop_off >= 0 suppresses records STARTING at/after that offset (the
// BAI chunk-end boundary). Scanning halts at a record with pos >= end
// (coordinate-sorted input), a truncated record, stop_off, or capacity.
//
// Returns the number of offsets written. *consumed = offset just past
// the last fully-scanned record (the resume point when the caller
// appends the next block and re-invokes). *state: 0 = need more bytes,
// 1 = done (pos >= end or stop_off reached or buffer ended exactly),
// 2 = out_off capacity exhausted (resume from *consumed).
int bam_scan(const uint8_t* buf, int64_t buf_len, int64_t start,
             int64_t stop_off, int tid, int64_t beg, int64_t end,
             int exclude_flags, int64_t* out_off, int out_cap,
             int64_t* consumed, int* state) {
  int n_out = 0;
  int64_t off = start;
  *state = 0;
  while (true) {
    if (stop_off >= 0 && off >= stop_off) {
      *state = 1;
      break;
    }
    if (off + 4 > buf_len) break;  // need more bytes for block_size
    const int64_t bsz = (int64_t)rd_i32(buf + off);
    if (bsz < 32) {  // corrupt record; stop rather than walk garbage
      *state = 1;
      break;
    }
    if (off + 4 + bsz > buf_len) break;  // truncated: need next block
    const uint8_t* rec = buf + off + 4;
    const int32_t refid = rd_i32(rec);
    const int64_t pos = (int64_t)rd_i32(rec + 4);
    if (refid == tid && pos >= end) {
      *consumed = off;
      *state = 1;
      return n_out;
    }
    bool pass = (refid == tid);
    if (pass) {
      const uint16_t flag = rd_u16(rec + 14);
      if (flag & exclude_flags) pass = false;
    }
    if (pass && pos + 1 <= beg) {
      // needs the CIGAR reference span to decide overlap
      const int l_read_name = rec[8];
      const int n_cigar = rd_u16(rec + 12);
      const uint8_t* cig = rec + 32 + l_read_name;
      int64_t span = 0;
      for (int k = 0; k < n_cigar; ++k) {
        uint32_t v;
        memcpy(&v, cig + 4 * (size_t)k, 4);
        if (ref_consume(v & 0xF)) span += v >> 4;
      }
      if (pos + (span > 0 ? span : 1) <= beg) pass = false;
    }
    if (pass) {
      if (n_out == out_cap) {
        *consumed = off;
        *state = 2;
        return n_out;
      }
      out_off[n_out++] = off;
    }
    off += 4 + bsz;
  }
  *consumed = off;
  return n_out;
}

// Bulk record decode: for each record offset (as returned by bam_scan),
// write the fixed fields into ints[8*i..] = {refid, pos, mapq, flag,
// next_refid, next_pos, tlen, l_seq} and the variable fields (name,
// bases as ASCII, quals as phred+33 chars) concatenated into text_buf.
// text_offs[3*i+0/1/2] = end offsets of name/bases/quals for record i
// (text_offs[-1] conceptually 0; caller passes an array of 3n and uses
// prev record's quals end as the start). Returns total bytes written to
// text_buf, or -1 if text_cap would be exceeded.
int64_t bam_decode_batch(const uint8_t* buf, const int64_t* offs, int n,
                         int32_t* ints, uint8_t* text_buf, int64_t text_cap,
                         int64_t* text_offs) {
  static const char kSeqCodes[17] = "=ACMGRSVTWYHKDBN";
  int64_t w = 0;
  for (int i = 0; i < n; ++i) {
    const uint8_t* rec = buf + offs[i] + 4;
    const int32_t refid = rd_i32(rec);
    const int32_t pos = rd_i32(rec + 4);
    const int l_read_name = rec[8];
    const int mapq = rec[9];
    const int n_cigar = rd_u16(rec + 12);
    const int flag = rd_u16(rec + 14);
    const int32_t l_seq = rd_i32(rec + 16);
    const int32_t next_refid = rd_i32(rec + 20);
    const int32_t next_pos = rd_i32(rec + 24);
    const int32_t tlen = rd_i32(rec + 28);
    int32_t* f = ints + 8 * (size_t)i;
    f[0] = refid; f[1] = pos; f[2] = mapq; f[3] = flag;
    f[4] = next_refid; f[5] = next_pos; f[6] = tlen; f[7] = l_seq;
    const int64_t need = (l_read_name - 1) + 2 * (int64_t)l_seq;
    if (w + need > text_cap) return -1;
    // name (drop trailing NUL)
    memcpy(text_buf + w, rec + 32, (size_t)(l_read_name - 1));
    w += l_read_name - 1;
    text_offs[3 * (size_t)i] = w;
    // bases: 4-bit codes -> ASCII
    const uint8_t* seq = rec + 32 + l_read_name + 4 * (size_t)n_cigar;
    uint8_t* out = text_buf + w;
    for (int32_t j = 0; j < l_seq; ++j) {
      const uint8_t b = seq[j >> 1];
      out[j] = (uint8_t)kSeqCodes[(j & 1) ? (b & 0xF) : (b >> 4)];
    }
    w += l_seq;
    text_offs[3 * (size_t)i + 1] = w;
    // quals: phred -> printable; 0xFF sentinel row -> '#'
    const uint8_t* q = seq + (l_seq + 1) / 2;
    out = text_buf + w;
    if (l_seq > 0 && q[0] == 0xFF) {
      memset(out, '#', (size_t)l_seq);
    } else {
      for (int32_t j = 0; j < l_seq; ++j) {
        const int v = q[j] + 33;
        out[j] = (uint8_t)(v > 255 ? 255 : v);
      }
    }
    w += l_seq;
    text_offs[3 * (size_t)i + 2] = w;
  }
  return w;
}

}  // extern "C"
