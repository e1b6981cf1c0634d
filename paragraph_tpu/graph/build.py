"""VCF → sequence-graph conversion.

Functional equivalent of the reference's
``src/python/lib/grm/vcfgraph/vcfgraph.py`` (VCFGraph) and ``graphUtils.py``
(graph passes), re-implemented without pysam / intervaltree. Every pass
preserves the reference's node/edge insertion and iteration orders because
downstream node ids (and hence aligner tie-breaking) depend on them.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Set, Tuple

from ..io.fasta import FastaFile
from ..io.regions import parse_region
from ..io.vcf import VcfRecord
from .model import GraphContainer


class NoVCFRecordsException(Exception):
    pass


_COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def reverse_complement(seq: str) -> str:
    return "".join(_COMPLEMENT[x] for x in reversed(seq))


class _IntervalSet:
    """Minimal replacement for the intervaltree operations VCFGraph uses:
    addi / slice / split_overlaps / sorted iteration. Intervals are
    (begin, end_exclusive, haplotypes:set); exact duplicates collapse."""

    def __init__(self):
        self._items: List[Tuple[int, int, Set[str]]] = []

    def addi(self, begin: int, end: int, haplos: Set[str]):
        for b, e, h in self._items:
            if b == begin and e == end and h == haplos:
                return
        self._items.append((begin, end, set(haplos)))

    def slice(self, point: int):
        out = []
        for b, e, h in self._items:
            if b < point < e:
                out.append((b, point, h))
                out.append((point, e, h))
            else:
                out.append((b, e, h))
        self._items = self._dedup(out)

    @staticmethod
    def _dedup(items):
        seen = []
        for it in items:
            if not any(b == it[0] and e == it[1] and h == it[2] for b, e, h in seen):
                seen.append(it)
        return seen

    def split_overlaps(self):
        bounds = sorted({b for b, _, _ in self._items} | {e for _, e, _ in self._items})
        out = []
        for b, e, h in self._items:
            cuts = [x for x in bounds if b < x < e]
            prev = b
            for c in cuts:
                out.append((prev, c, h))
                prev = c
            out.append((prev, e, h))
        self._items = self._dedup(out)

    def __iter__(self):
        return iter(self._items)

    def sorted(self):
        return sorted(self._items, key=lambda t: (t[0], t[1]))


class AltAllele:
    __slots__ = ("key", "start", "end", "sequence", "haplotypes")

    def __init__(self, key, start, end, sequence, haplotypes):
        self.key = key
        self.start = start
        self.end = end
        self.sequence = sequence
        self.haplotypes = haplotypes


def generate_variant_id(record: VcfRecord, var_id_counts: Optional[dict] = None) -> str:
    """vcfgraph.py:generate_variant_id."""
    if record.id:
        var_id = record.id
        if var_id_counts is not None:
            if var_id in var_id_counts:
                raise ValueError(f"Duplicated variant ID: {var_id}")
            var_id_counts[var_id] = 1
    else:
        var_id = f"{record.chrom}:{record.pos}"
        if var_id_counts is not None:
            var_id_counts[var_id] = var_id_counts.get(var_id, 0) + 1
            var_id = f"{var_id}-{var_id_counts[var_id]}"
    return var_id


def generate_allele_ids(record: VcfRecord, var_id: str):
    return [(f"{var_id}:{n}", record.alleles[n]) for n in range(len(record.alleles))]


class VCFGraph:
    """Reference-interval + alt-allele model of one VCF region
    (vcfgraph.py:36-436)."""

    def __init__(self, ref_file: str, chrom: str = "chr"):
        self.ref_fasta = FastaFile(ref_file)
        self.alts: Dict[str, AltAllele] = {}
        self.refs = _IntervalSet()
        self.chrom = chrom
        self.first_pos: Optional[int] = None
        self.last_pos: Optional[int] = None

    @staticmethod
    def create_from_vcf(ref_file_name: str, records: List[VcfRecord],
                        ins_info_key: str,
                        chrom=None, start=None, end=None,
                        padding_length: int = 150,
                        allele_graph: bool = False) -> "VCFGraph":
        graph = VCFGraph(ref_file_name, chrom)
        var_id_counts: Dict[str, int] = {}
        record_count = 0
        for record in records:
            if chrom is None:
                chrom = record.chrom
                graph.chrom = chrom
            elif chrom != record.chrom:
                break
            if start is not None and record.pos < start:
                continue
            if end is not None and record.pos > end:
                continue
            if graph.first_pos is None:
                graph.first_pos = record.pos
            if graph.last_pos is None or graph.last_pos < record.stop:
                graph.last_pos = record.stop
            var_id = generate_variant_id(record, var_id_counts)
            record_count += 1
            graph.add_record(record, allele_graph, var_id, ins_info_key)
        if not record_count:
            raise NoVCFRecordsException(
                f"No VCF records found at {chrom}:{start}-{end}")
        graph.add_ref_support(
            graph.first_pos - padding_length, graph.last_pos + padding_length)
        for be in graph.alts.values():
            if graph.first_pos <= be.end <= graph.last_pos:
                graph.refs.slice(be.end + 1)
            else:
                graph.add_ref_support(be.end + 1, be.end + padding_length)
        return graph

    def add_record(self, vcf: VcfRecord, allele_graph: bool, var_id: str,
                   ins_info_key: str):
        if not allele_graph:
            samples = {}
            for name, vals in vcf.sample_values.items():
                gt = vals.get("GT", ".")
                gt_alleles = re.split(r"[/|]", gt)
                if "." in gt_alleles:
                    continue
                first = int(gt_alleles[0])
                samples[name] = vcf.alleles[first]
        else:
            samples = {x: y for x, y in generate_allele_ids(vcf, var_id)}

        ref_samples = set(s for s in samples if samples[s] == vcf.ref)
        self.add_ref_support(vcf.pos, vcf.stop, ref_samples, vcf.alleles)
        for alt in vcf.alts or []:
            alt_samples = set(s for s in samples if samples[s] == alt)
            ref_sequence = self.ref_fasta.fetch(
                self.chrom, vcf.pos - 1, vcf.stop).upper()
            if "<" in alt:
                if alt == "<INS>":
                    if ins_info_key not in vcf.info:
                        raise ValueError(
                            f"Missing key {ins_info_key} for <INS> at "
                            f"{self.chrom}:{vcf.pos}")
                    ins_seq = str(vcf.info[ins_info_key]).upper()
                    if re.search(r"[^ACGTNXacgtnx]", ins_seq):
                        raise ValueError(
                            f"Illegal character in INS sequence: {ins_seq}")
                    alt_sequence = ref_sequence[0] + ins_seq
                    self.add_alt(vcf.pos, vcf.stop, ref_sequence, alt_sequence,
                                 alt_samples, ref_samples)
                else:
                    if vcf.stop == vcf.pos:
                        raise ValueError(
                            f"{vcf.chrom}:{vcf.pos} same END and POS in "
                            "symbolic non-insertion (missing END?)")
                    if alt == "<DEL>":
                        self.add_alt(vcf.pos, vcf.stop, ref_sequence,
                                     ref_sequence[0], alt_samples)
                    elif alt == "<DUP>":
                        self.add_alt(vcf.pos, vcf.pos, ref_sequence[0],
                                     ref_sequence, alt_samples, ref_samples)
                    elif alt == "<INV>":
                        if len(ref_sequence) > 20000:
                            inv_ref = (ref_sequence[1:1000]
                                       + ref_sequence[len(ref_sequence) - 1000:])
                        else:
                            inv_ref = ref_sequence[1:]
                        alt_sequence = ref_sequence[0] + reverse_complement(inv_ref)
                        self.add_alt(vcf.pos, vcf.stop, ref_sequence,
                                     alt_sequence, alt_samples, ref_samples)
            else:
                if re.search(r"[^ACGTNXacgtnx]", alt):
                    raise ValueError(f"Illegal character in ALT allele: {alt}")
                if len(alt[0]) > 1 or len(ref_sequence) > 1:
                    if alt[0].upper() != ref_sequence[0]:
                        raise ValueError(
                            f"Different padding base for REF and ALT at "
                            f"{vcf.chrom}:{vcf.pos}")
                self.add_alt(vcf.pos, vcf.stop, ref_sequence, alt,
                             alt_samples, ref_samples)

    def add_ref_support(self, start: int, end: int, haplos=(), alleles=None):
        """vcfgraph.py:218-242 — leading shared padding is not haplotype-
        labelled."""
        pad = 0
        if alleles:
            min_len = min(len(a) for a in alleles)
            while pad < min_len and all(alleles[0][pad] == a[pad] for a in alleles):
                pad += 1
            if start + pad > end + 1:
                raise ValueError(f"{start}:{end} error in adding ref support.")
        if pad > 0:
            self.refs.addi(start, end + 1, set())
            if haplos and start + pad <= end:
                self.refs.addi(start + pad, end + 1, set(haplos))
        else:
            self.refs.addi(start, end + 1, set(haplos))

    def get_ref_alleles(self):
        """Non-overlapping reference pieces with merged haplotype sets
        (vcfgraph.py:244-260)."""
        self.refs.split_overlaps()
        last = None
        for b, e, h in self.refs.sorted():
            if last is None:
                last = (b, e, set(h))
            elif not (b == last[0] and e == last[1]):
                yield last
                last = (b, e, set(h))
            else:
                last = (last[0], last[1], last[2] | h)
        if last is not None:
            yield last

    def add_alt(self, start, end, ref, alt, haplos=(), other_haplos=()):
        """vcfgraph.py:262-302 — trims shared padding, adds insertion bypass
        alleles for haplotypes typed for another allele."""
        if len(ref) != end - start + 1:
            raise ValueError(f"{start}:{end} REF != END - POS + 1")
        alt_start, alt_end = start, end
        while alt and ref and ref[0] == alt[0]:
            ref = ref[1:]
            alt = alt[1:]
            alt_start += 1
        if alt_start > start:
            self.add_ref_support(start, alt_start - 1)
        while alt and ref and ref[-1] == alt[-1]:
            ref = ref[:-1]
            alt = alt[:-1]
            alt_end -= 1
        if alt_end <= 0:
            raise ValueError(f"{start}:{end} negative or zero ALT end.")
        if alt_start <= alt_end < end:
            self.add_ref_support(alt_end + 1, end, haplos)
        if not ref and not alt:
            raise ValueError(f"{start}:{end} missing REF or ALT sequence.")
        self._add_alt(alt_start, alt_end, alt, haplos)
        if other_haplos and alt_start > alt_end:
            self._add_alt(alt_start, alt_end, "", other_haplos)

    def _parse_breakend(self, alt: str):
        m = re.match(r"([ACGTNXacgtnx]+)([\[\]])([^\[\]]+)([\[\]])", alt)
        if not m:
            raise ValueError(f"Unsupported breakend ALT: {alt}")
        ins_sequence = m.group(1)
        if m.group(2) != "[" or m.group(4) != "[":
            raise ValueError("Reverse-comp breakends are not supported.")
        be_chrom, be_start, be_end = parse_region(m.group(3))
        if be_end:
            raise ValueError(f"{be_start}:{be_end} illegal breakends.")
        if be_chrom != self.chrom:
            raise ValueError("Breakends across chromosomes are not supported.")
        return ins_sequence, be_start

    def add_breakend(self, pos, ref_seq, end, haplos=(), ins_seq="",
                     ref_haplos=()):
        alt_start = pos
        while ref_seq and ins_seq and ref_seq[0] == ins_seq[0]:
            ref_seq = ref_seq[1:]
            ins_seq = ins_seq[1:]
            alt_start += 1
        if alt_start == end - 1:
            raise ValueError(f"{pos}:{end} illegal breakend alt start.")
        self.add_ref_support(pos, end - 1)
        self._add_alt(alt_start, end - 1, ins_seq, haplos)
        self._add_alt(alt_start, alt_start - 1, "", ref_haplos)
        self._add_alt(end, end - 1, "", ref_haplos)

    def _add_alt(self, start, end, seq, haplos=()):
        key = f"{start}-{end}:{seq}"
        if key not in self.alts:
            self.alts[key] = AltAllele(key, start, end, seq, set())
        self.alts[key].haplotypes.update(haplos)

    def get_haplotypes(self) -> Set[str]:
        hs = set()
        for a in self.alts.values():
            hs |= a.haplotypes
        for _, _, h in self.refs:
            hs |= h
        hs.discard(None)
        return hs

    def get_graph(self, allele_graph: bool = False) -> GraphContainer:
        """Produce the paragraph node/edge representation
        (vcfgraph.py:367-431)."""
        graph = GraphContainer()
        pnode = None
        for b, e, h in self.get_ref_alleles():
            node = graph.add_ref_node(self.chrom, b, e - 1, h)
            if pnode:
                if pnode["end"] + 1 != node["start"]:
                    raise ValueError(
                        f"{node['start']}:{pnode['end']} node start != prev "
                        "node end + 1")
                graph.add_edge(pnode, node)
            pnode = node
        for alt in self.alts.values():
            graph.add_alt_node(self.chrom, alt.start, alt.end, alt.sequence,
                               alt.haplotypes)

        for haplo in self.get_haplotypes():
            nodes = graph.nodes_by_haplo(haplo)
            pnode = None
            for node in nodes:
                if pnode:
                    if pnode["end"] == node["start"] - 1:
                        graph.add_edge(pnode, node, [haplo])
                    pnode_is_ref_dummy = (
                        pnode["end"] == pnode["start"] - 1
                        and not pnode["sequence"])
                    pnode_ends_before_node = (
                        pnode["end"] < node["start"]
                        and pnode["start"] < node["start"])
                    if not pnode_is_ref_dummy and not pnode_ends_before_node:
                        raise ValueError(
                            f"Inconsistent nodes for haplotype {haplo}: "
                            f"{pnode['name']}, {node['name']}")
                pnode = node

        for node in list(graph.alt_nodes()):
            if allele_graph or not any(graph.in_edges(node)):
                graph.add_edge(
                    graph.refNode_ending_at[node["chrom"], node["start"] - 1],
                    node)
            if not any(graph.out_edges(node)):
                graph.add_edge(
                    node,
                    graph.refNode_starting_at[node["chrom"], node["end"] + 1])
            if allele_graph:
                # NB reference indexes nodes_starting_at by bare position here
                # (vcfgraph.py:413), missing the (chrom, pos) keys — a no-op
                # retained for parity.
                is_insertion = node["end"] < node["start"]
                for n in graph.nodes_starting_at[node["end"] + 1]:
                    if not (is_insertion and n["end"] < n["start"]):
                        graph.add_edge(node, n)

        for haplo in self.get_haplotypes():
            for node in graph.nodes_by_haplo(haplo):
                if not any(graph.in_edges(node, haplo)):
                    for e in list(graph.in_edges(node)):
                        graph.add_edge(graph.nodes[e["from"]], node, [haplo])
                if not any(graph.in_edges(node, haplo)):
                    raise ValueError("Error in get graph.")
                if not any(graph.out_edges(node, haplo)):
                    for e in list(graph.out_edges(node)):
                        graph.add_edge(node, graph.nodes[e["to"]], [haplo])
        return graph


# ---------------------------------------------------------------------------
# Graph passes (graphUtils.py equivalents)
# ---------------------------------------------------------------------------

def add_source_sink(graph: GraphContainer, source_name="source",
                    sink_name="sink"):
    if source_name not in graph.nodes:
        graph.nodes[source_name] = {"name": source_name, "sequence": "N" * 10}
    if sink_name not in graph.nodes:
        graph.nodes[sink_name] = {"name": sink_name, "sequence": "N" * 10}
    for node in list(graph.nodes.values()):
        if node["name"] in (source_name, sink_name):
            continue
        if not any(graph.in_edges(node)):
            graph.add_edge(graph.nodes[source_name], node)
        if not any(graph.out_edges(node)):
            graph.add_edge(node, graph.nodes[sink_name])


def split_ref_nodes(graph: GraphContainer, max_len=300, padding_len=150):
    assert max_len >= 2 * padding_len
    for node in list(graph.ref_nodes()):
        if node["end"] - node["start"] + 1 <= max_len:
            continue
        first_end = node["start"] + padding_len - 1
        n1 = graph.add_ref_node(node["chrom"], node["start"], first_end,
                                node["sequences"])
        snd_start = node["end"] - padding_len + 1
        n2 = graph.add_ref_node(node["chrom"], snd_start, node["end"],
                                node["sequences"])
        for e in list(graph.in_edges(node)):
            graph.add_edge(graph.nodes[e["from"]], n1, e["sequences"])
        for e in list(graph.out_edges(node)):
            graph.add_edge(n2, graph.nodes[e["to"]], e["sequences"])
        graph.del_node(node)


def split_alt_nodes(graph: GraphContainer, max_len=300, padding_len=150):
    assert max_len >= 2 * padding_len
    for node in list(graph.alt_nodes()):
        if len(node["sequence"]) <= max_len:
            continue
        n1 = graph.add_alt_node(node["chrom"], node["start"], node["end"],
                                node["sequence"][:padding_len],
                                node["sequences"])
        n2 = graph.add_alt_node(node["chrom"], node["start"], node["end"],
                                node["sequence"][-padding_len:],
                                node["sequences"])
        for e in list(graph.in_edges(node)):
            graph.add_edge(graph.nodes[e["from"]], n1, e["sequences"])
        for e in list(graph.out_edges(node)):
            graph.add_edge(n2, graph.nodes[e["to"]], e["sequences"])
        graph.del_node(node)


def remove_empty_nodes(graph: GraphContainer):
    for node in list(graph.nodes.values()):
        if (("reference" in node and node["start"] <= node["end"])
                or node.get("sequence", "") != ""):
            continue
        in_seqs = [s for e in graph.in_edges(node) for s in e["sequences"]]
        out_seqs = [s for e in graph.out_edges(node) for s in e["sequences"]]
        for e1 in list(graph.in_edges(node)):
            for e2 in list(graph.out_edges(node)):
                haplos = e1["sequences"].intersection(e2["sequences"]).union(
                    e1["sequences"].difference(out_seqs).union(
                        e2["sequences"].difference(in_seqs)))
                graph.add_edge(graph.nodes[e1["from"]],
                               graph.nodes[e2["to"]], haplos)
        graph.del_node(node)


def combine_nodes(graph: GraphContainer):
    for n1 in list(graph.nodes.values()):
        if n1["name"] not in graph.nodes:
            continue
        if len(list(graph.out_edges(n1))) != 1:
            continue
        n2 = graph.nodes[next(graph.out_edges(n1))["to"]]
        if len(list(graph.in_edges(n2))) != 1:
            continue
        if not (n1.get("chrom") == n2.get("chrom")
                and n1.get("end", -2) + 1 == n2.get("start", -4)):
            continue
        haplos = n1["sequences"]
        if n2["sequences"] != haplos:
            continue
        if "reference" in n1:
            if "reference" not in n2:
                continue
            node = graph.add_ref_node(n1["chrom"], n1["start"], n2["end"],
                                      haplos)
        else:
            if "reference" in n2:
                continue
            node = graph.add_alt_node(n1["chrom"], n1["start"], n2["end"],
                                      n1["sequence"] + n2["sequence"], haplos)
        for e in list(graph.in_edges(n1)):
            graph.add_edge(graph.nodes[e["from"]], node, e["sequences"])
        for e in list(graph.out_edges(n2)):
            graph.add_edge(node, graph.nodes[e["to"]], e["sequences"])
        graph.del_node(n1)
        graph.del_node(n2)


def get_path(graph: GraphContainer, sequence):
    """Paths (node-name lists) covering all edges for one haplotype
    (graphUtils.py:179-208)."""
    nodes, edges = graph.topological_sort()
    marked: Set[str] = set()

    def visit(edge, cur_path):
        node = graph.nodes[edge["to"]]
        cur_path = cur_path + [node["name"]]
        marked.add(edge["name"])
        paths = []
        for e in graph.out_edges(node, sequence):
            if e["name"] not in marked:
                paths.extend(visit(e, cur_path))
        if not paths:
            paths = [cur_path]
        return paths

    paths = []
    for node in nodes:
        for edge in graph.out_edges(node, sequence):
            if edge["name"] not in marked:
                paths += visit(edge, [node["name"]])
    return paths


def ref_paths(graph: GraphContainer):
    for f_node in graph.ref_nodes():
        for edge in graph.out_edges(f_node):
            n_node = graph.nodes[edge["to"]]
            if "reference" in n_node and f_node["end"] + 1 == n_node["start"]:
                graph.add_edge(f_node, n_node, ["REF"])
    res = []
    for path in get_path(graph, "REF"):
        res.append({
            "nodes": path,
            "path_id": f"REF|{len(res) + 1}",
            "sequence": "REF",
        })
    return res


def add_ref_path(graph: GraphContainer):
    for path in ref_paths(graph):
        graph.paths.append(path)


def add_alt_paths(graph: GraphContainer):
    res = []
    rp = ref_paths(graph)
    for path in get_path(graph, None):
        if path[0] == "source":
            path = path[1:]
        if path[-1] == "sink":
            path = path[:-1]
        if path not in [p["nodes"] for p in rp]:
            res.append({
                "nodes": path,
                "path_id": f"ALT|{len(res) + 1}",
                "sequence": "ALT",
            })
            graph.sequences.add("ALT")
    graph.paths += res


def add_graph(graph1: GraphContainer, graph2: GraphContainer):
    for node in graph2.ref_nodes():
        graph1.add_ref_node(node["chrom"], node["start"], node["end"],
                            node["sequences"])
    for node in graph2.alt_nodes():
        graph1.add_alt_node(node["chrom"], node["start"], node["end"],
                            node["sequence"], node["sequences"])
    for edge in graph2.edges.values():
        graph1.add_edge(graph1.nodes[edge["from"]], graph1.nodes[edge["to"]],
                        edge["sequences"])
    graph1.paths += graph2.paths


def load_json(json_dict: dict) -> GraphContainer:
    graph = GraphContainer()
    for node in json_dict["nodes"]:
        seqs = node.get("sequences", ())
        if "reference" in node:
            chrom, start, end = parse_region(node["reference"])
            graph.add_ref_node(chrom, start, end, seqs, node["name"])
        elif "position" in node:
            chrom, start, end = parse_region(node["position"])
            graph.add_alt_node(chrom, start, end, node["sequence"], seqs,
                               node["name"])
        else:
            graph.nodes[node["name"]] = node
    for edge in json_dict["edges"]:
        seqs = edge.get("sequences", ())
        graph.add_edge(graph.nodes[edge["from"]], graph.nodes[edge["to"]],
                       seqs)
    graph.name = json_dict["model_name"]
    graph.paths = json_dict.get("paths", [])
    graph.target_regions = json_dict.get("target_regions", [])
    graph.check()
    return graph


# ---------------------------------------------------------------------------
# Conversion driver (vcf2paragraph/__init__.py convert_vcf equivalent)
# ---------------------------------------------------------------------------

def convert_vcf_records(records: List[VcfRecord],
                        ref: str,
                        ins_info_key: str = "SEQ",
                        target_regions=None,
                        ref_node_padding: int = 150,
                        ref_node_max_length: int = 1000,
                        allele_graph: bool = False,
                        simplify: bool = True,
                        alt_paths: bool = False,
                        alt_splitting: bool = False) -> dict:
    """Convert a block of VCF records to one graph JSON dict
    (vcf2paragraph/__init__.py:48-114)."""
    graph = GraphContainer("Graph from VCF")
    region_list = ([parse_region(r) for r in target_regions]
                   if target_regions else [(None, None, None)])
    for chrom, start, end in region_list:
        try:
            vcf_graph = VCFGraph.create_from_vcf(
                ref, records, ins_info_key, chrom, start, end,
                ref_node_padding, allele_graph)
        except NoVCFRecordsException:
            continue
        chrom_graph = vcf_graph.get_graph(allele_graph)
        if ref_node_max_length:
            split_ref_nodes(chrom_graph, ref_node_max_length, ref_node_padding)
            if alt_splitting:
                split_alt_nodes(chrom_graph, ref_node_max_length,
                                ref_node_padding)
        if simplify:
            remove_empty_nodes(chrom_graph)
            combine_nodes(chrom_graph)
        chrom_graph.check()
        add_graph(graph, chrom_graph)

    graph.target_regions = target_regions or list(graph.get_reference_regions())
    add_source_sink(graph)
    add_ref_path(graph)
    if alt_paths:
        add_alt_paths(graph)
    graph.check()
    return graph.json_dict()
