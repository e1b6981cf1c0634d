"""Synthesize a multi-event SV genotyping workload (dev/bench tool).

Builds a random reference contig, plants heterozygous/homozygous deletions
and insertions, simulates ~depth× paired 150bp reads (with sequencing
errors), and writes ref.fa / sample.bam(.bai) / candidates.vcf / truth.json
into an output directory. Used by the end-to-end throughput bench and
stress tests; mirrors the reference's EAGLE-based simulation harness intent
(doc/validation-with-simulated-reads.md) with an in-repo generator.
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import random
import struct
import zlib


def bgzf_block(data: bytes) -> bytes:
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = comp.compress(data) + comp.flush()
    bsize = len(cdata) + 25 + 1
    header = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff" +
              struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2) +
              struct.pack("<H", bsize - 1))
    return header + cdata + struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF) + \
        struct.pack("<I", len(data))


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")

_CODE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}


def bam_record(name, flag, tid, pos, mapq, cigar, mtid, mpos, tlen, seq, qual):
    enc_name = name.encode() + b"\x00"
    n_cigar = len(cigar)
    cig = b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
    seq_bytes = bytearray()
    for i in range(0, len(seq), 2):
        hi = _CODE[seq[i]] << 4
        lo = _CODE[seq[i + 1]] if i + 1 < len(seq) else 0
        seq_bytes.append(hi | lo)
    qual_bytes = bytes(ord(q) - 33 for q in qual)
    data = struct.pack("<iiBBHHHiiii", tid, pos, len(enc_name), mapq,
                       4680, n_cigar, flag, len(seq), mtid, mpos, tlen)
    data += enc_name + cig + bytes(seq_bytes) + qual_bytes
    return struct.pack("<i", len(data)) + data


def write_bam(path, contig, contig_len, records):
    header_text = f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{contig}\tLN:{contig_len}\n"
    hdr = b"BAM\x01" + struct.pack("<i", len(header_text)) + \
        header_text.encode()
    hdr += struct.pack("<i", 1)
    hdr += struct.pack("<i", len(contig) + 1) + contig.encode() + b"\x00"
    hdr += struct.pack("<i", contig_len)
    with open(path, "wb") as f:
        f.write(bgzf_block(hdr))
        buf = b""
        for r in records:
            buf += r
            if len(buf) > 50000:
                f.write(bgzf_block(buf))
                buf = b""
        if buf:
            f.write(bgzf_block(buf))
        f.write(BGZF_EOF)
    # index with our own BAI writer: simplest is to re-read with the pure
    # Python reader and emit a minimal linear+binning index
    index_bam(path)


def index_bam(path):
    """Minimal BAI builder (one chunk per 16kb window via standard bins)."""
    from paragraph_tpu.io.bgzf import BgzfReader

    bgzf = BgzfReader(path)
    magic = bgzf.read(4)
    assert magic == b"BAM\x01"
    l_text = struct.unpack("<i", bgzf.read(4))[0]
    bgzf.read(l_text)
    n_ref = struct.unpack("<i", bgzf.read(4))[0]
    for _ in range(n_ref):
        l_name = struct.unpack("<i", bgzf.read(4))[0]
        bgzf.read(l_name)
        bgzf.read(4)
    bins = {}
    ioffsets = []
    n_mapped = 0
    first_voff = last_voff = None
    while True:
        voff = bgzf.tell_virtual()
        raw = bgzf.read(4)
        if len(raw) < 4:
            break
        size = struct.unpack("<i", raw)[0]
        data = bgzf.read(size)
        refid, pos = struct.unpack_from("<ii", data, 0)
        n_cigar = struct.unpack_from("<H", data, 12)[0]
        l_read_name = data[8]
        rlen = 0
        off = 32 + l_read_name
        for i in range(n_cigar):
            v = struct.unpack_from("<I", data, off + 4 * i)[0]
            if (v & 0xF) in (0, 2, 3, 7, 8):
                rlen += v >> 4
        end = pos + max(rlen, 1)
        n_mapped += 1
        # smallest bin containing [pos, end)
        b = 0
        for shift, offset in ((14, 4681), (17, 585), (20, 73), (23, 9),
                              (26, 1)):
            if (pos >> shift) == ((end - 1) >> shift):
                b = offset + (pos >> shift)
                break
        vend = bgzf.tell_virtual()
        if first_voff is None:
            first_voff = voff
        last_voff = vend
        bins.setdefault(b, []).append((voff, vend))
        w_beg, w_end = pos >> 14, (end - 1) >> 14
        while len(ioffsets) <= w_end:
            ioffsets.append(0)
        for w in range(w_beg, w_end + 1):
            if ioffsets[w] == 0 or voff < ioffsets[w]:
                ioffsets[w] = voff
    # fill linear index gaps
    last = 0
    for i, v in enumerate(ioffsets):
        if v == 0:
            ioffsets[i] = last
        else:
            last = v
    out = b"BAI\x01" + struct.pack("<i", 1)
    merged_bins = {}
    for b, chunks in bins.items():
        chunks.sort()
        m = [list(chunks[0])]
        for c in chunks[1:]:
            if c[0] <= m[-1][1]:
                m[-1][1] = max(m[-1][1], c[1])
            else:
                m.append(list(c))
        merged_bins[b] = m
    out += struct.pack("<i", len(merged_bins) + 1)
    for b in sorted(merged_bins):
        out += struct.pack("<Ii", b, len(merged_bins[b]))
        for beg, end in merged_bins[b]:
            out += struct.pack("<QQ", beg, end)
    # 37450 pseudo bin: (ref span voffsets), (mapped, unmapped) stats
    out += struct.pack("<Ii", 37450, 2)
    out += struct.pack("<QQ", first_voff or 0, last_voff or 0)
    out += struct.pack("<QQ", n_mapped, 0)
    out += struct.pack("<i", len(ioffsets))
    for v in ioffsets:
        out += struct.pack("<Q", v)
    with open(path + ".bai", "wb") as f:
        f.write(out)


def generate(out_dir, n_events=50, depth=30, read_len=150, frag_len=400,
             contig="chrS", spacing=6000, seed=1,
             kinds=("DEL", "INS", "DUP", "INV", "DELSNP"),
             n_samples=1):
    """Plant a mixed SV workload (BASELINE.json's "~1k mixed
    DEL/INS/DUP/INV batch" config): symbolic DUP (tandem) and INV events
    alongside sequence-explicit DEL/INS, plus nested deletion+SNP events
    (two records sharing an ID — use split_type="by_id")."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    events = []
    pos = 2000
    for i in range(n_events):
        kind = kinds[i % len(kinds)] if len(kinds) > 1 else kinds[0]
        if kind == "DUP":
            # tandem duplications longer than the reads leave every
            # REF-supporting read non-unique (the dup node and the ref
            # node carry identical sequence), so short-read genotyping
            # only works for sub-read-length dups — same limitation as
            # the reference's uniqueness-filter semantics
            size = rng.randint(60, read_len - 10)
        else:
            size = rng.randint(60, 400)
        gt = rng.choice(["0/1", "1/1", "0/0"])
        ev = {"kind": kind, "pos": pos, "size": size, "gt": gt}
        if kind == "DELSNP":
            # nested: a SNP 60bp upstream of the deletion on the same
            # haplotype; emitted as a separate record close enough for
            # the superloci split to merge into one graph
            ev["snp_pos"] = pos - 60
        events.append(ev)
        pos += spacing
    ref_len = pos + 2000
    ref = "".join(rng.choices("ACGT", k=ref_len))

    # make insertion sequences deterministic across haplotypes
    for ev in events:
        if ev["kind"] == "INS":
            ev["ins_seq"] = "".join(rng.choices("ACGT", k=ev["size"]))
        if ev["kind"] == "DELSNP":
            old = ref[ev["snp_pos"]]
            ev["snp_alt"] = rng.choice(
                [b for b in "ACGT" if b != old])

    def rc(s):
        return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]

    # haplotypes: apply alt allele per event where gt says so; track the
    # hap→ref coordinate map so read placement is analytic
    def apply(hap_idx, gt_of):
        parts = []
        cur = 0
        anchors = []  # (hap_start, ref_start, seg_len) of ref-copied runs
        hap_len = 0
        for ev in events:
            gt = gt_of(ev)
            has_alt = (gt == "1/1" or (gt == "0/1" and hap_idx == 1))
            seg_len = ev["pos"] - cur
            seg = ref[cur:ev["pos"]]
            if has_alt and ev["kind"] == "DELSNP":
                off = ev["snp_pos"] - cur
                seg = seg[:off] + ev["snp_alt"] + seg[off + 1:]
            anchors.append((hap_len, cur, seg_len))
            parts.append(seg)
            hap_len += seg_len
            if has_alt:
                if ev["kind"] in ("DEL", "DELSNP"):
                    cur = ev["pos"] + ev["size"]
                elif ev["kind"] == "DUP":
                    # tandem duplication: extra copy at the start of the
                    # duplicated segment (matches vcfgraph <DUP> semantics)
                    parts.append(ref[ev["pos"]:ev["pos"] + ev["size"]])
                    hap_len += ev["size"]
                    cur = ev["pos"]
                elif ev["kind"] == "INV":
                    parts.append(rc(ref[ev["pos"]:ev["pos"] + ev["size"]]))
                    hap_len += ev["size"]
                    cur = ev["pos"] + ev["size"]
                else:  # INS
                    parts.append(ev["ins_seq"])
                    hap_len += ev["size"]
                    cur = ev["pos"]
            else:
                cur = ev["pos"]
        anchors.append((hap_len, cur, ref_len - cur))
        parts.append(ref[cur:])
        return "".join(parts), anchors

    # per-sample genotypes: sample 0 = the events' "gt" (the original
    # single-sample contract); further samples are independent draws
    sample_names = ["sample"] + [f"sample{k}" for k in range(1, n_samples)]
    for ev in events:
        ev["gts"] = {"sample": ev["gt"]}
        for name in sample_names[1:]:
            ev["gts"][name] = rng.choice(["0/1", "1/1", "0/0"])

    import bisect

    def hap_to_ref(anchors, s):
        """Reference position of hap offset s (insertion offsets map to
        the insertion point — the graph aligner re-aligns anyway)."""
        starts = [a[0] for a in anchors]
        k = bisect.bisect_right(starts, s) - 1
        hap_start, ref_start, seg_len = anchors[k]
        off = s - hap_start
        return ref_start + min(off, max(seg_len - 1, 0))

    def simulate_sample(sample_name):
        gt_of = lambda ev: ev["gts"][sample_name]  # noqa: E731
        h0, a0 = apply(0, gt_of)
        h1, a1 = apply(1, gt_of)
        haps = [(h0, a0), (h1, a1)]
        # simulate reads
        n_frags = ref_len * depth // (2 * 2 * read_len)
        sim = []
        for i in range(n_frags * 2):
            hap, anchors = haps[i & 1]
            if len(hap) < frag_len + 10:
                continue
            start = rng.randrange(0, len(hap) - frag_len)
            frag = hap[start:start + frag_len]
            sim.append((f"sim{i}", frag[:read_len], frag[-read_len:],
                        hap_to_ref(anchors, start),
                        hap_to_ref(anchors, start + frag_len - read_len)))

        def mutate(s):
            k = rng.binomialvariate(len(s), 0.002) if hasattr(
                rng, "binomialvariate") else sum(
                    rng.random() < 0.002 for _ in range(len(s)))
            if not k:
                return s
            out = list(s)
            for _ in range(k):
                out[rng.randrange(len(out))] = rng.choice("ACGT")
            return "".join(out)

        qual = chr(33 + 30) * read_len
        records = []
        for name, r1, r2, p, p2 in sim:
            r1m, r2m = mutate(r1), mutate(r2)
            records.append((p, name, 99, p, p2, frag_len, r1m, qual, True))
            records.append((p2, name, 147, p2, p, -frag_len, rc(r2m), qual,
                            False))
        records.sort(key=lambda r: r[0])
        bam_recs = []
        for _, name, flag, p, mp, tlen, seq, q, first in records:
            bam_recs.append(bam_record(name, flag, 0, p, 60,
                                       [(0, read_len)], 0, mp, tlen, seq, q))
        write_bam(os.path.join(out_dir, f"{sample_name}.bam"), contig,
                  ref_len, bam_recs)

    for sample_name in sample_names:
        simulate_sample(sample_name)

    with open(os.path.join(out_dir, "ref.fa"), "w") as f:
        f.write(f">{contig}\n")
        for i in range(0, ref_len, 60):
            f.write(ref[i:i + 60] + "\n")
    if os.path.exists(os.path.join(out_dir, "ref.fa.fai")):
        os.remove(os.path.join(out_dir, "ref.fa.fai"))

    with open(os.path.join(out_dir, "candidates.vcf"), "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={contig},length={ref_len}>\n")
        f.write('##INFO=<ID=END,Number=1,Type=Integer,'
                'Description="SV end">\n')
        f.write('##ALT=<ID=DUP,Description="Duplication">\n')
        f.write('##ALT=<ID=INV,Description="Inversion">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for i, ev in enumerate(events):
            info = "."
            if ev["kind"] in ("DEL", "DELSNP"):
                ref_allele = ref[ev["pos"] - 1:ev["pos"] + ev["size"]]
                alt = ref[ev["pos"] - 1]
            elif ev["kind"] == "DUP":
                ref_allele = ref[ev["pos"] - 1]
                alt = "<DUP>"
                info = f"END={ev['pos'] + ev['size']}"
            elif ev["kind"] == "INV":
                ref_allele = ref[ev["pos"] - 1]
                alt = "<INV>"
                info = f"END={ev['pos'] + ev['size']}"
            else:
                ref_allele = ref[ev["pos"] - 1]
                alt = ref[ev["pos"] - 1] + ev["ins_seq"]
            if ev["kind"] == "DELSNP":
                # nested companion SNP 60bp upstream: within read_length
                # of the deletion, so split_type="superloci" merges both
                # records into one graph (IDs must stay distinct — the
                # builder rejects duplicate IDs per block, vcfgraph.py:80)
                f.write(f"{contig}\t{ev['snp_pos'] + 1}\tev{i}snp\t"
                        f"{ref[ev['snp_pos']]}\t{ev['snp_alt']}"
                        f"\t.\tPASS\t.\n")
            f.write(f"{contig}\t{ev['pos']}\tev{i}\t{ref_allele}\t{alt}"
                    f"\t.\tPASS\t{info}\n")

    with open(os.path.join(out_dir, "samples.txt"), "w") as f:
        f.write("id\tpath\tdepth\tread length\n")
        for name in sample_names:
            f.write(f"{name}\t{out_dir}/{name}.bam\t{depth}\t"
                    f"{read_len}\n")

    with open(os.path.join(out_dir, "truth.json"), "w") as f:
        json.dump(events, f, indent=1)
    return events


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--events", type=int, default=50)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()
    evs = generate(args.out_dir, n_events=args.events, depth=args.depth,
                   seed=args.seed)
    print(f"wrote {len(evs)} events to {args.out_dir}")
