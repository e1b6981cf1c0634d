"""idxdepth differential fixture vs the reference's estimateDepths
semantics (/root/reference/src/c++/lib/idxdepth/DepthEstimation.cpp:
48-295).

The fixture BAM tiles a contig with exactly-uniform coverage, so every
quantity the reference algorithm defines has a closed-form expected
value independent of its sampling choices: the pileup depth median must
be exactly the tiling depth, read_length is the unique read length,
unaligned_reads counts the '*' records, and the autosome/sex-chromosome
classification follows the default regexes. Depth feeds λ in the
genotyper — a silent divergence here shifts every GT (VERDICT r03 #9).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))


DEPTH = 10
READ_LEN = 100
CONTIG_LEN = 40000


@pytest.fixture(scope="module")
def uniform_bam(tmp_path_factory):
    import random

    from make_workload import bam_record, write_bam

    out = tmp_path_factory.mktemp("idxdepth")
    rng = random.Random(5)
    seq = "".join(rng.choice("ACGT") for _ in range(CONTIG_LEN))
    ref = str(out / "ref.fa")
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, CONTIG_LEN, 60):
            f.write(seq[i:i + 60] + "\n")

    # exact tiling: a read starts every READ_LEN/DEPTH bases, so every
    # base in [READ_LEN, CONTIG_LEN - READ_LEN) is covered exactly DEPTH
    # times; only the two contig edges ramp
    step = READ_LEN // DEPTH
    recs = []
    qual = chr(33 + 30) * READ_LEN
    i = 0
    for start in range(0, CONTIG_LEN - READ_LEN, step):
        recs.append(bam_record(
            f"r{i}", 0, 0, start + 1, 60, [(0, READ_LEN)], -1, -1, 0,
            seq[start:start + READ_LEN], qual))
        i += 1
    bam = str(out / "uniform.bam")
    write_bam(bam, "chr1", CONTIG_LEN, recs)
    return bam, ref, i


def test_uniform_coverage_exact(uniform_bam):
    from paragraph_tpu.pipeline.idxdepth import estimate_depths

    bam, ref, n_reads = uniform_bam
    result = estimate_depths(bam, ref)

    # output document structure per DepthEstimation.cpp:146-268
    assert result["bam_path"] == bam
    assert result["reference"] == ref
    assert result["unaligned_reads"] == 0

    contigs = {c["name"]: c for c in result["contigs"]}
    assert set(contigs) == {"chr1"}
    c = contigs["chr1"]
    assert c["reads"] == n_reads
    # interior pileup is exactly DEPTH everywhere: any median estimator
    # the reference's sampling picks must land on it
    assert c["depth"] == pytest.approx(DEPTH, abs=0.51)

    # single uniform read length -> reported as the unique value
    assert result["read_length"] == READ_LEN

    # default autosome regex classifies chr1 as autosome; overall depth
    # equals the (only) autosome depth
    assert result["autosome"]["contigs"] == ["chr1"]
    assert result["autosome"]["depth"] == pytest.approx(DEPTH, abs=0.51)


def test_mixed_read_lengths_not_unique(uniform_bam):
    """read_length_unique=false path (DepthEstimation.cpp:241-246):
    mixed lengths must be flagged and the modal length reported."""
    import random

    from make_workload import bam_record, write_bam

    from paragraph_tpu.pipeline.idxdepth import estimate_depths

    bam, ref, _ = uniform_bam
    out_dir = os.path.dirname(bam)
    rng = random.Random(7)
    seq_len = 5000
    seq = "".join(rng.choice("ACGT") for _ in range(seq_len))
    ref2 = os.path.join(out_dir, "ref2.fa")
    with open(ref2, "w") as f:
        f.write(">chr2\n" + seq + "\n")
    recs = []
    for i, start in enumerate(range(0, 4000, 40)):
        ln = 100 if i % 3 else 80
        recs.append(bam_record(
            f"m{i}", 0, 0, start + 1, 60, [(0, ln)], -1, -1, 0,
            seq[start:start + ln], chr(63) * ln))
    bam2 = os.path.join(out_dir, "mixed.bam")
    write_bam(bam2, "chr2", seq_len, recs)

    result = estimate_depths(bam2, ref2)
    assert result["read_length"] == 100
    assert result.get("read_length_unique") is False
