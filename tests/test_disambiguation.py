"""Port of the reference's test_disambiguation.cpp fixture & expectations."""
from paragraph_tpu.align.composite import align_reads
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.disambig import disambiguate_reads
from paragraph_tpu.reads.read import Read


def _fixture():
    reads = [
        Read(fragment_id="f0",
             bases="AAAAAAAAAATTTTTTTTTTTTTTTTTTTTAAAAAAAAAA"),
        Read(fragment_id="f1", bases="AAAAAAAAAATTTTTTTTTTT"),
        Read(fragment_id="f2",
             bases="AAAAAAAAAATTTTTTTTTTGGGGGGGGGGAAAAAAAAAA"),
        Read(fragment_id="f3", bases="AAAAAAAAAAAAAAAAAAAA"),
    ]
    g = SequenceGraph(
        ["LF", "R1", "R2", "A1", "RF"],
        ["AAAAAAAAAA", "TTTTTTTTTT", "TTTTTTTTTT", "GGGGGGGGGG",
         "AAAAAAAAAA"])
    for f, t in [(0, 1), (0, 4), (1, 2), (1, 3), (2, 4), (3, 4)]:
        g.add_edge(f, t)
    g.add_label_to_edge(0, 1, "R")
    g.add_label_to_edge(1, 2, "R")
    g.add_label_to_edge(2, 4, "R")
    g.add_label_to_edge(0, 4, "D")
    return g, reads


def _run(engine):
    g, reads = _fixture()
    align_reads(g, [], reads, None, False, True, False, False,
                engine=engine)
    # test_disambiguation.cpp calls disambiguateReads without filters
    disambiguate_reads(g, reads, use_node_filter=False,
                       use_edge_filter=False)
    return reads


def _check(reads):
    assert reads[0].graph_sequences_supported == ["R"]
    assert reads[1].graph_sequences_supported == ["R"]
    assert reads[2].graph_sequences_supported == []
    assert reads[3].graph_sequences_supported == ["D"]


def test_disambiguates_reads_scalar():
    _check(_run("scalar"))


def test_disambiguates_reads_batched():
    _check(_run("batched"))
