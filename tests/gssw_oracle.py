"""ctypes bridge to the reference gssw library for differential testing.

Compiles /root/reference/external/gssw/gssw.c (read-only reference; nothing
is copied into this repo) into /tmp/libgssw_test.so at test time and exposes
graph fill + traceback so tests can compare our GraphSW implementation
cell-exactly against the original.
"""
import ctypes
import os
import subprocess

_GSSW_C = "/root/reference/external/gssw/gssw.c"
_GSSW_DIR = "/root/reference/external/gssw"
_LIB = "/tmp/libgssw_test.so"


def build_lib():
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_GSSW_C)):
        subprocess.check_call([
            "gcc", "-O2", "-fPIC", "-shared", "-msse4.1",
            "-o", _LIB, _GSSW_C, "-I", _GSSW_DIR,
        ])
    return _LIB


class GsswRef:
    """Minimal wrapper over the reference gssw C API."""

    def __init__(self):
        lib = ctypes.CDLL(build_lib())
        self.lib = lib
        lib.gssw_create_nt_table.restype = ctypes.POINTER(ctypes.c_int8)
        lib.gssw_create_score_matrix.restype = ctypes.POINTER(ctypes.c_int8)
        lib.gssw_node_create.restype = ctypes.c_void_p
        lib.gssw_node_create.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8)]
        lib.gssw_graph_create.restype = ctypes.c_void_p
        lib.gssw_graph_create.argtypes = [ctypes.c_uint32]
        lib.gssw_graph_add_node.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.gssw_nodes_add_edge.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.gssw_graph_fill.restype = ctypes.c_void_p
        lib.gssw_graph_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int8), ctypes.c_uint8, ctypes.c_uint8,
            ctypes.c_int32, ctypes.c_int8]
        lib.gssw_graph_trace_back.restype = ctypes.c_void_p
        lib.gssw_graph_trace_back.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_uint8, ctypes.c_uint8]
        lib.gssw_graph_destroy.argtypes = [ctypes.c_void_p]
        lib.gssw_graph_mapping_destroy.argtypes = [ctypes.c_void_p]
        self.nt_table = lib.gssw_create_nt_table()
        self.mat = lib.gssw_create_score_matrix(1, 4)

    def align(self, node_seqs, edges, read, gap_open=6, gap_extend=1):
        """Build graph, fill, trace back.

        Returns (score, position, [(node_id, cigar_str), ...], max_node_id,
        per-node (score1, ref_end1, read_end1) list).
        """
        lib = self.lib
        nodes = []
        for i, seq in enumerate(node_seqs):
            nodes.append(lib.gssw_node_create(
                None, i, seq.encode(), self.nt_table, self.mat))
        for f, t in edges:
            lib.gssw_nodes_add_edge(nodes[f], nodes[t])
        graph = lib.gssw_graph_create(len(nodes))
        for n in nodes:
            lib.gssw_graph_add_node(graph, n)
        lib.gssw_graph_fill(graph, read.encode(), self.nt_table, self.mat,
                            6, 1, 15, 2)

        # struct offsets: gssw_graph { uint32_t size; gssw_node* max_node;
        #                              gssw_node** nodes; }
        class GsswGraphS(ctypes.Structure):
            _fields_ = [("size", ctypes.c_uint32),
                        ("max_node", ctypes.c_void_p),
                        ("nodes", ctypes.c_void_p)]

        class GsswAlignS(ctypes.Structure):
            # gssw.h:83-112
            _fields_ = [("score1", ctypes.c_uint16),
                        ("score2", ctypes.c_uint16),
                        ("ref_begin1", ctypes.c_int32),
                        ("ref_end1", ctypes.c_int32),
                        ("read_begin1", ctypes.c_int32),
                        ("read_end1", ctypes.c_int32),
                        ("ref_end2", ctypes.c_int32),
                        ("seed_pvE", ctypes.c_void_p),
                        ("seed_pvHStore", ctypes.c_void_p),
                        ("is_byte", ctypes.c_uint8),
                        ("mH", ctypes.c_void_p),
                        ("mE", ctypes.c_void_p),
                        ("mF", ctypes.c_void_p)]

        # gssw_node layout (gssw.h:151-162)
        class GsswNodeS(ctypes.Structure):
            _fields_ = [("data", ctypes.c_void_p),
                        ("id", ctypes.c_uint32),
                        ("seq", ctypes.c_char_p),
                        ("num", ctypes.c_void_p),
                        ("len", ctypes.c_int32),
                        ("prev", ctypes.c_void_p),
                        ("count_prev", ctypes.c_int32),
                        ("next", ctypes.c_void_p),
                        ("count_next", ctypes.c_int32),
                        ("alignment", ctypes.c_void_p)]

        gs = GsswGraphS.from_address(graph)
        max_node_s = GsswNodeS.from_address(gs.max_node)
        max_node_id = max_node_s.id

        per_node = []
        for n in nodes:
            ns = GsswNodeS.from_address(n)
            al = GsswAlignS.from_address(ns.alignment)
            per_node.append((al.score1, al.ref_end1, al.read_end1))

        gm = lib.gssw_graph_trace_back(
            graph, read.encode(), len(read), self.nt_table, self.mat, 6, 1)

        # gssw.h:184-198
        class GsswNodeCigarS(ctypes.Structure):
            _fields_ = [("node", ctypes.c_void_p),
                        ("cigar", ctypes.c_void_p)]

        class GsswGraphCigarS(ctypes.Structure):
            _fields_ = [("length", ctypes.c_uint32),
                        ("elements", ctypes.c_void_p)]

        class GsswGraphMappingS(ctypes.Structure):
            _fields_ = [("position", ctypes.c_int32),
                        ("score", ctypes.c_int16),
                        ("cigar", GsswGraphCigarS)]

        class GsswCigarS(ctypes.Structure):
            _fields_ = [("length", ctypes.c_int32),
                        ("elements", ctypes.c_void_p)]

        class GsswCigarElemS(ctypes.Structure):
            _fields_ = [("type", ctypes.c_char),
                        ("length", ctypes.c_uint32)]

        gms = GsswGraphMappingS.from_address(gm)
        node_cigars = []
        elem_size = ctypes.sizeof(GsswNodeCigarS)
        for i in range(gms.cigar.length):
            nc = GsswNodeCigarS.from_address(gms.cigar.elements + i * elem_size)
            node_s = GsswNodeS.from_address(nc.node)
            cig = GsswCigarS.from_address(nc.cigar)
            ops = []
            ce_size = ctypes.sizeof(GsswCigarElemS)
            for k in range(cig.length):
                ce = GsswCigarElemS.from_address(cig.elements + k * ce_size)
                ops.append(f"{ce.length}{ce.type.decode()}")
            node_cigars.append((node_s.id, "".join(ops)))

        result = (gms.score, gms.position, node_cigars, max_node_id, per_node)
        lib.gssw_graph_mapping_destroy(gm)
        lib.gssw_graph_destroy(graph)
        return result
