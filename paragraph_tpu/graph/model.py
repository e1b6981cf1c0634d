"""Sequence graph data models.

Two representations:

- ``GraphContainer``: the host-side construction model used while converting
  VCFs to graphs (dict-based nodes/edges with haplotype label sets) —
  functional equivalent of the reference's python GraphContainer
  (src/python/lib/grm/vcfgraph/graphContainer.py).

- ``SequenceGraph``: the immutable, topologically-ordered model the aligner
  and genotyper operate on — functional equivalent of graph-tools'
  ``graphtools::Graph`` built by grm::graphFromJson
  (src/c++/lib/grm/GraphInput.cpp:51-161). Node ids are dense ints in
  topological order; predecessors/successors are returned sorted (the C++
  uses std::set<NodeId>, which gssw node wiring depends on).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Set, Tuple


class GraphContainer:
    """Mutable dict-based graph used during VCF→graph conversion."""

    def __init__(self, name: str = "VCF Graph"):
        self.name = name
        self.chroms: Set[str] = set()
        self.target_regions = None
        self.sequences: Set[str] = set()
        self.paths: List[dict] = []
        self.nodes: Dict[str, dict] = {}
        self.refNode_starting_at: Dict[tuple, dict] = {}
        self.refNode_ending_at: Dict[tuple, dict] = {}
        self.nodes_starting_at = defaultdict(list)
        self.edges: Dict[str, dict] = {}
        self.edges_by_node = defaultdict(list)

    @staticmethod
    def _edge_key(n1: dict, n2: dict) -> str:
        return n1["name"] + "_" + n2["name"]

    def add_edge(self, node_from: dict, node_to: dict, haplos: Iterable[str] = ()):
        ekey = self._edge_key(node_from, node_to)
        if ekey not in self.edges:
            assert node_from["name"] != node_to["name"]
            edge = {
                "from": node_from["name"],
                "to": node_to["name"],
                "sequences": set(),
                "name": ekey,
            }
            self.edges[ekey] = edge
            self.edges_by_node[node_from["name"]].append(edge)
            self.edges_by_node[node_to["name"]].append(edge)
        self.edges[ekey]["sequences"].update(haplos)
        self.sequences.update(haplos)

    def del_edge(self, edge: dict):
        self.edges_by_node[edge["from"]] = [
            e for e in self.edges_by_node[edge["from"]] if e["name"] != edge["name"]
        ]
        self.edges_by_node[edge["to"]] = [
            e for e in self.edges_by_node[edge["to"]] if e["name"] != edge["name"]
        ]
        del self.edges[edge["name"]]

    def has_edge(self, node_from: dict, node_to: dict) -> bool:
        return self._edge_key(node_from, node_to) in self.edges

    def get_edge(self, name_from: str, name_to: str) -> dict:
        return self.edges[self._edge_key(self.nodes[name_from], self.nodes[name_to])]

    def in_edges(self, node: dict, haplo: Optional[str] = None):
        for e in self.edges_by_node[node["name"]]:
            if e["to"] == node["name"]:
                if haplo is None or haplo in e["sequences"]:
                    yield e

    def out_edges(self, node: dict, haplo: Optional[str] = None):
        for e in self.edges_by_node[node["name"]]:
            if e["from"] == node["name"]:
                if haplo is None or haplo in e["sequences"]:
                    yield e

    def alt_nodes(self, chrom: Optional[str] = None):
        for n in self.nodes.values():
            if "reference" not in n:
                if chrom is None or chrom == n.get("chrom"):
                    yield n

    def ref_nodes(self, chrom: Optional[str] = None):
        for n in self.nodes.values():
            if "reference" in n:
                if chrom is None or chrom == n.get("chrom"):
                    yield n

    def add_alt_node(self, chrom, start, end, sequence, sequences=(), name=None):
        ref_span = f"{chrom}:{start}-{end}"
        name = name or f"{ref_span}:{sequence}"
        node = {
            "name": name,
            "position": ref_span,
            "sequence": sequence,
            "sequences": set(sequences),
            "chrom": chrom,
            "start": start,
            "end": end,
        }
        self.chroms.add(chrom)
        self.nodes_starting_at[chrom, start].append(node)
        self.nodes[name] = node
        self.sequences.update(sequences)
        return node

    def add_ref_node(self, chrom, start, end, sequences=(), name=None):
        ref_span = f"{chrom}:{start}-{end}"
        node = {
            "name": name or f"ref-{ref_span}",
            "reference": ref_span,
            "sequences": set(sequences),
            "chrom": chrom,
            "start": start,
            "end": end,
        }
        self.chroms.add(chrom)
        self.refNode_starting_at[chrom, start] = node
        self.refNode_ending_at[chrom, end] = node
        self.nodes_starting_at[chrom, start].append(node)
        self.nodes[node["name"]] = node
        self.sequences.update(sequences)
        return node

    def del_node(self, node: dict):
        for e in list(self.edges_by_node[node["name"]]):
            self.del_edge(e)
        # NB the reference indexes nodes_starting_at by bare start here
        # (graphContainer.py:145) which is a separate key space from the
        # (chrom, start) tuples used elsewhere — so deletion leaves the
        # (chrom,start) entry in place. Replicated for parity.
        self.nodes_starting_at[node["start"]] = [
            n for n in self.nodes_starting_at[node["start"]]
            if n["name"] != node["name"]
        ]
        del self.nodes[node["name"]]

    def nodes_by_haplo(self, haplo: str):
        ns = [n for n in self.nodes.values() if haplo in n.get("sequences", ())]
        ns.sort(key=lambda n: (n["start"], n["end"]))
        return ns

    def check(self):
        for e in self.edges.values():
            assert e["from"] in self.nodes
            assert e["to"] in self.nodes
            assert e["from"] != e["to"]
        for p in self.paths:
            assert p["sequence"] in self.sequences
            for n in p["nodes"]:
                assert n in self.nodes

    def topological_sort(self):
        """DFS-based topological sort.

        Matches graphContainer.py:168-195 exactly (including the
        name-sorted child visit order), because the resulting node order
        defines node ids and thereby aligner tie-breaking.
        """
        ordered_nodes: List[dict] = []
        marks: Dict[str, str] = {}

        def visit(node):
            marks[node["name"]] = "t"
            nnodes = [self.nodes[e["to"]] for e in self.out_edges(node)]
            for x in sorted(nnodes, key=lambda n: n["name"]):
                if x["name"] not in marks:
                    visit(x)
                elif marks[x["name"]] == "t":
                    raise ValueError(
                        f"Graph has a cycle at {node['name']} -> {x['name']}")
            marks[node["name"]] = "p"
            ordered_nodes.insert(0, node)

        for node in self.nodes.values():
            if node["name"] not in marks:
                visit(node)
        node_order = {n["name"]: i for i, n in enumerate(ordered_nodes)}
        all_edges = sorted(
            self.edges.values(),
            key=lambda e: (node_order[e["from"]], node_order[e["to"]]),
        )
        return ordered_nodes, all_edges

    def get_reference_regions(self):
        for chrom in self.chroms:
            ivs = sorted(
                (n["start"], n["end"] + 1) for n in self.ref_nodes(chrom))
            merged = []
            for s, e in ivs:
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            for s, e in merged:
                yield f"{chrom}:{s}-{e - 1}"

    def json_dict(self) -> dict:
        """Paragraph graph JSON representation (graphContainer.py:209-241)."""
        attribs_to_del = ["mark", "vcfId", "chrom", "start", "end"]
        s_nodes, s_edges = self.topological_sort()
        nodes = []
        for n in s_nodes:
            n = dict(n)
            for a in attribs_to_del + ["sequences"]:
                n.pop(a, None)
            nodes.append(n)
        edges = []
        for e in s_edges:
            e = dict(e)
            for a in attribs_to_del:
                e.pop(a, None)
            if "sequences" in e:
                e["sequences"] = sorted(e["sequences"])
                if not e["sequences"]:
                    del e["sequences"]
            edges.append(e)
        return {
            "nodes": nodes,
            "edges": edges,
            "paths": self.paths,
            "target_regions": sorted(self.target_regions),
            "sequencenames": sorted(self.sequences),
            "model_name": self.name,
        }


class SequenceGraph:
    """Immutable aligned-graph model (graphtools::Graph equivalent).

    Nodes are ordered as in the JSON (must be topological: every edge goes
    from a lower to a higher node id, as asserted by the reference's gssw
    bridge GraphAligner.cpp:151).
    """

    def __init__(self, node_names: List[str], node_seqs: List[str]):
        self.node_names = list(node_names)
        self.node_seqs = list(node_seqs)
        self.name_to_id = {n: i for i, n in enumerate(node_names)}
        n = len(node_names)
        self._succ: List[Set[int]] = [set() for _ in range(n)]
        self._pred: List[Set[int]] = [set() for _ in range(n)]
        self._edge_labels: Dict[Tuple[int, int], Set[str]] = {}

    @property
    def num_nodes(self) -> int:
        return len(self.node_names)

    def node_name(self, node_id: int) -> str:
        return self.node_names[node_id]

    def node_seq(self, node_id: int) -> str:
        return self.node_seqs[node_id]

    def add_edge(self, from_id: int, to_id: int):
        if from_id >= to_id:
            raise ValueError(
                f"Edges must be topological: {from_id} -> {to_id}")
        self._succ[from_id].add(to_id)
        self._pred[to_id].add(from_id)
        self._edge_labels.setdefault((from_id, to_id), set())

    def has_edge(self, from_id: int, to_id: int) -> bool:
        return (from_id, to_id) in self._edge_labels

    def add_label_to_edge(self, from_id: int, to_id: int, label: str):
        self._edge_labels[(from_id, to_id)].add(label)

    def edge_labels(self, from_id: int, to_id: int) -> Set[str]:
        return self._edge_labels.get((from_id, to_id), set())

    def successors(self, node_id: int) -> List[int]:
        return sorted(self._succ[node_id])

    def predecessors(self, node_id: int) -> List[int]:
        return sorted(self._pred[node_id])

    def edges(self):
        return sorted(self._edge_labels.keys())

    @classmethod
    def from_json(cls, desc: dict, reference_path: str = "",
                  fasta=None) -> "SequenceGraph":
        """Build from a paragraph graph JSON (grm::graphFromJson semantics).

        - source/sink placeholder nodes (first/last, named source/sink any
          case) get sequence "X" (GraphInput.cpp:86-89)
        - literal `sequence` is used verbatim; `reference` regions are
          fetched from the FASTA and uppercased (GraphInput.cpp:90-125)
        - node-level `sequences` labels are shortcuts for labelling all
          in/out edges (GraphInput.cpp:143-158)
        """
        if "graph" in desc:
            desc = {**desc, **desc["graph"]}
        nodes = desc["nodes"]
        names = []
        seqs = []
        if fasta is None and reference_path:
            from ..io.fasta import FastaFile

            fasta = FastaFile(reference_path)
        n_nodes = len(nodes)
        for i, jn in enumerate(nodes):
            name = jn.get("name", f"node-{i + 1}")
            names.append(name)
            is_source_or_sink = (
                i in (0, n_nodes - 1) and name.upper() in ("SOURCE", "SINK"))
            if is_source_or_sink:
                seqs.append("X")
            elif "sequence" in jn:
                seqs.append(jn["sequence"])
            else:
                ref = jn["reference"]
                if isinstance(ref, str):
                    seqs.append(fasta.query(ref))
                else:
                    seq = ""
                    for loc in ref:
                        cur = fasta.query(loc)
                        if seq:
                            assert seq == cur
                        seq = cur
                    seqs.append(seq)
        g = cls(names, seqs)
        for je in desc.get("edges") or []:
            f = g.name_to_id[je["from"]]
            t = g.name_to_id[je["to"]]
            g.add_edge(f, t)
            for label in je.get("sequences", []):
                g.add_label_to_edge(f, t, label)
        for i, jn in enumerate(nodes):
            for label in jn.get("sequences", []):
                for h in g.predecessors(i):
                    g.add_label_to_edge(h, i, label)
                for j in g.successors(i):
                    g.add_label_to_edge(i, j, label)
        return g

    def reversed(self) -> "SequenceGraph":
        """Reverse graph: node order, sequences and edges reversed
        (graphtools GraphOperations::reverseGraph)."""
        n = self.num_nodes
        names = [self.node_names[n - 1 - i] for i in range(n)]
        seqs = [self.node_seqs[n - 1 - i][::-1] for i in range(n)]
        g = SequenceGraph(names, seqs)
        for (f, t), labels in self._edge_labels.items():
            nf, nt = n - 1 - t, n - 1 - f
            g.add_edge(nf, nt)
            for l in labels:
                g.add_label_to_edge(nf, nt, l)
        return g


def paths_from_json(graph: SequenceGraph, json_paths) -> List[List[int]]:
    """Path node-id lists from JSON (grm::pathsFromJson)."""
    out = []
    for p in json_paths or []:
        out.append([graph.name_to_id[n] for n in p["nodes"]])
    return out
