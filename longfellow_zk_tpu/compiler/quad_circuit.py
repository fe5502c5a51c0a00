"""Arithmetic-circuit builder and compiler producing layered quad circuits.

Semantic twin of reference lib/circuits/compiler/{node,compiler,schedule}.h:
algebraic simplification (constant folding, k*(k1*x) fusion, depth-aware
add merging), hash-based CSE, dead-code elimination, layering with copy
wires, canonical wire-id assignment (Morton-ordered term sort /
byte-lexicographic constant compare, schedule.h:201-294), and quad
emission with EQuad canonicalization + coalescing (equad.h:60-124).

Produces bit-identical Circuit structures (and hence circuit ids and
proofs) to the reference compiler given the same build calls.  This is
host-side, offline work — circuits are compiled once and cached.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..proto.lfc1 import lg
from ..sumcheck.circuit import Circuit, Layer, Quad

WIRE_ID_UNDEFINED = -1


@dataclass
class Node:
    terms: List[Tuple[int, int, int]]  # (ki, op0, op1), op0 <= op1
    is_input: bool = False
    is_assert0: bool = False
    is_output: bool = False
    desired_wire_id_for_input: int = WIRE_ID_UNDEFINED
    desired_wire_id_for_output: int = WIRE_ID_UNDEFINED
    depth: int = 0
    max_needed_depth: int = 0
    is_needed: bool = False

    def zero(self) -> bool:
        return not self.is_input and not self.terms

    def constant(self) -> bool:
        return len(self.terms) == 1 and self.terms[0][1] == 0 and \
            self.terms[0][2] == 0

    def linearp(self) -> bool:
        return len(self.terms) == 1 and self.terms[0][1] == 0

    def cse_key(self):
        return (self.is_input, self.is_assert0,
                self.desired_wire_id_for_input, tuple(self.terms))

    def desired_wire_id(self, depth0: int, depth_ub: int) -> int:
        if self.is_input and depth0 == 0:
            return self.desired_wire_id_for_input
        if self.is_output and depth0 + 1 == depth_ub:
            return self.desired_wire_id_for_output
        return WIRE_ID_UNDEFINED


def _mk_term(ki: int, op0: int, op1: int) -> Tuple[int, int, int]:
    assert ki != 0, "ki != 0"
    return (ki, min(op0, op1), max(op0, op1))


class QuadCircuit:
    def __init__(self, F):
        self.F = F
        self.constants: List = []
        self._kmap: Dict = {}
        self.nodes: List[Node] = []
        self._cse: Dict = {}
        self.ninput = 0
        self.npub_input = 0
        self.subfield_boundary = 0
        self.noutput = 0
        self.depth = 0
        self.nwires_cse_eliminated = 0
        self.nwires_not_needed = 0
        self.nwires = None
        self.nquad_terms = None
        self.nwires_overhead = None
        ki0 = self.kstore(F.of_scalar(0))
        assert ki0 == 0
        ki1 = self.kstore(F.of_scalar(1))
        assert ki1 == 1
        self.input_wire()  # node 0 carries input[0] = 1

    # -- constant table -----------------------------------------------------

    def kstore(self, k) -> int:
        if k not in self._kmap:
            self._kmap[k] = len(self.constants)
            self.constants.append(k)
        return self._kmap[k]

    def kload(self, ki: int):
        return self.constants[ki]

    # -- builder API --------------------------------------------------------

    def input_wire(self) -> int:
        n = Node(terms=[], is_input=True,
                 desired_wire_id_for_input=self.ninput)
        self.ninput += 1
        return self._push(n)

    def private_input(self) -> None:
        assert self.npub_input == 0, \
            "private_input can only be called once after setting public inputs"
        self.npub_input = self.ninput

    def begin_full_field(self) -> None:
        assert self.subfield_boundary == 0
        self.subfield_boundary = self.ninput

    def konst(self, k) -> int:
        ki = self.kstore(k)
        terms = [] if ki == 0 else [_mk_term(ki, 0, 0)]
        return self._push(Node(terms=terms))

    def linear(self, op0: int, k=None) -> int:
        if k is None:
            return self.mul2(0, op0)
        return self.mul3(k, 0, op0)

    def mul1(self, k, op: int) -> int:
        F = self.F
        if k == F.of_scalar(0):
            return self.konst(k)
        if k == F.of_scalar(1) or self.nodes[op].zero():
            return op
        return self._push(self._scale(k, op))

    def mul2(self, op0: int, op1: int) -> int:
        return self.mul3(self.F.of_scalar(1), op0, op1)

    def mul3(self, k, op0: int, op1: int) -> int:
        F = self.F
        n0 = self.nodes[op0]
        n1 = self.nodes[op1]
        if n0.zero():
            return op0
        if n0.constant():
            return self.mul1(F.mul_i(k, self.kload(n0.terms[0][0])), op1)
        if n0.linearp():
            return self.mul3(F.mul_i(k, self.kload(n0.terms[0][0])),
                             n0.terms[0][2], op1)
        if n1.zero() or n1.constant() or n1.linearp():
            return self.mul3(k, op1, op0)
        return self._push(Node(terms=[_mk_term(self.kstore(k), op0, op1)]))

    # aliases matching the reference overloads
    def mul(self, *args):
        if len(args) == 2 and isinstance(args[0], int) and \
                isinstance(args[1], int) and args[0] < len(self.nodes) and \
                False:
            pass
        if len(args) == 3:
            return self.mul3(*args)
        return self.mul2(*args)

    def add(self, op0: int, op1: int) -> int:
        n0 = self.nodes[op0]
        n1 = self.nodes[op1]
        if n0.zero():
            return op1
        if n1.zero():
            return op0
        # depth-aware merge heuristic (compiler.h:152-168)
        if n0.depth < n1.depth:
            op0 = self.linear(op0)
        elif n1.depth < n0.depth:
            op1 = self.linear(op1)
        return self._push(self._merge(op0, op1))

    def sub(self, op0: int, op1: int) -> int:
        return self.add(op0, self.mul1(self.F.neg_i(self.F.of_scalar(1)), op1))

    def assert0(self, op: int) -> int:
        n = self.nodes[op]
        if n.zero():
            return op
        if n.linearp():
            if n.terms[0][0] == 0:
                return op
            return self.assert0(n.terms[0][2])
        nn = Node(terms=[(0, 0, op)], is_assert0=True)
        return self._push(nn)

    def axpy(self, y: int, a, x: int) -> int:
        if a == self.F.of_scalar(0):
            return y
        return self.add(y, self.linear(x, a))

    def apy(self, y: int, a) -> int:
        if a == self.F.of_scalar(0):
            return y
        return self.add(y, self.konst(a))

    def output_wire(self, n: int, wire_id: int) -> None:
        nn = self.nodes[n]
        assert not nn.is_output, "outputting the same node twice"
        nn.is_output = True
        nn.desired_wire_id_for_output = wire_id
        self.noutput += 1

    # -- internals ----------------------------------------------------------

    def _push(self, n: Node) -> int:
        key = n.cse_key()
        if key in self._cse:
            if not n.linearp():
                self.nwires_cse_eliminated += 1
            return self._cse[key]
        depth = 0
        for (_, op0, op1) in n.terms:
            depth = max(depth, 1 + max(self.nodes[op0].depth,
                                       self.nodes[op1].depth))
        n.depth = depth
        nid = len(self.nodes)
        self.nodes.append(n)
        self._cse[key] = nid
        return nid

    def _materialize_input(self, op: int) -> Node:
        n = self.nodes[op]
        if n.is_input:
            return Node(terms=[_mk_term(1, 0, op)])
        assert not n.is_output or True
        return Node(terms=list(n.terms), is_input=n.is_input,
                    is_assert0=n.is_assert0,
                    desired_wire_id_for_input=n.desired_wire_id_for_input,
                    depth=n.depth)

    def _scale(self, k, op: int) -> Node:
        F = self.F
        n = self._materialize_input(op)
        n.terms = [(self.kstore(F.mul_i(self.kload(ki), k)), a, b)
                   for (ki, a, b) in n.terms]
        return Node(terms=n.terms)

    def _merge(self, op0: int, op1: int) -> Node:
        F = self.F
        t0 = self._materialize_input(op0).terms
        t1 = self._materialize_input(op1).terms
        terms = []
        i0 = i1 = 0

        def ndx(t):
            return (t[2], t[1])  # order by (op1, op0) (node.h:58-62)

        while i0 < len(t0) and i1 < len(t1):
            if t0[i0][1] == t1[i1][1] and t0[i0][2] == t1[i1][2]:
                ki = self.kstore(F.add_i(self.kload(t0[i0][0]),
                                         self.kload(t1[i1][0])))
                if ki != 0:
                    terms.append((ki, t0[i0][1], t0[i0][2]))
                i0 += 1
                i1 += 1
            elif ndx(t0[i0]) < ndx(t1[i1]):
                if t0[i0][0] != 0:
                    terms.append(t0[i0])
                i0 += 1
            else:
                if t1[i1][0] != 0:
                    terms.append(t1[i1])
                i1 += 1
        terms.extend(t for t in t0[i0:] if t[0] != 0)
        terms.extend(t for t in t1[i1:] if t[0] != 0)
        return Node(terms=terms)

    # -- compilation --------------------------------------------------------

    def mkcircuit(self, nc: int) -> Circuit:
        depth_ub = self._compute_depth_ub()
        self._fixup_last_layer_assertions(depth_ub)
        self._compute_needed(depth_ub)
        circ = Scheduler(self).mkcircuit(depth_ub, nc)
        circ.ninputs = self.ninput
        circ.npub_in = self.npub_input
        circ.subfield_boundary = self.subfield_boundary
        from ..proto.lfc1 import circuit_id
        circ.id = circuit_id(self.F, circ)
        return circ

    def _compute_depth_ub(self) -> int:
        r = 0
        for n in self.nodes:
            if n.is_output:
                r = max(r, 1 + n.depth)
            elif n.is_assert0:
                r = max(r, n.depth if n.linearp() else 1 + n.depth)
        self.depth = r
        return r

    def _fixup_last_layer_assertions(self, depth_ub: int) -> None:
        for n in list(self.nodes):
            if (not n.is_output and n.is_assert0 and n.depth == depth_ub
                    and n.linearp()):
                n.is_assert0 = False
                self.output_wire(n.terms[0][2], WIRE_ID_UNDEFINED)

    def _mark_needed(self, op: int, depth_at_which_needed: int) -> None:
        nfo = self.nodes[op]
        nfo.is_needed = True
        nfo.max_needed_depth = max(depth_at_which_needed,
                                   nfo.max_needed_depth)
        if depth_at_which_needed > nfo.depth + 1:
            n0 = self.nodes[0]
            n0.is_needed = True
            n0.max_needed_depth = max(depth_at_which_needed - 1,
                                      n0.max_needed_depth)

    def _compute_needed(self, depth_ub: int) -> None:
        self.nwires_not_needed = 0
        for i in range(len(self.nodes) - 1, -1, -1):
            nfo = self.nodes[i]
            if nfo.is_input:
                self._mark_needed(i, 1)
            if nfo.is_output:
                self._mark_needed(i, depth_ub)
            if nfo.is_assert0:
                self._mark_needed(i, nfo.depth + 1)
            if nfo.is_needed:
                for (_, op0, op1) in nfo.terms:
                    self._mark_needed(op0, nfo.depth)
                    self._mark_needed(op1, nfo.depth)
            else:
                self.nwires_not_needed += 1


def dump_info(tag: str, qc: "QuadCircuit") -> str:
    """Compiler stats line (reference circuit_dump.h:65: the
    'd: 7 wires: 21099 ...' lines)."""
    line = ("%s depth: %d wires: %s in: %d out:%d use:%s ovh:%s t:%s "
            "cse:%d notn:%d" % (
                tag, qc.depth, qc.nwires, qc.ninput, qc.noutput,
                (qc.nwires - qc.nwires_overhead
                 if qc.nwires is not None and qc.nwires_overhead is not None
                 else "?"),
                qc.nwires_overhead, qc.nquad_terms,
                qc.nwires_cse_eliminated, len(qc.nodes)))
    return line


def _morton_key(h0: int, h1: int) -> int:
    """Interleaved (h0 even bits, h1 odd bits) Morton code
    (util/ceildiv.h morton namespace)."""
    k = 0
    b = 0
    while h0 or h1:
        k |= (h0 & 1) << (2 * b)
        k |= (h1 & 1) << (2 * b + 1)
        h0 >>= 1
        h1 >>= 1
        b += 1
    return k


class Scheduler:
    """(schedule.h:36-431)."""

    def __init__(self, qc: QuadCircuit):
        self.qc = qc
        self.F = qc.F
        self.nwires = 0
        self.nquad_terms = 0
        self.nwires_overhead = 0

    def mkcircuit(self, depth_ub: int, nc: int) -> Circuit:
        qc = self.qc
        lnodes = self._order_by_layer(depth_ub)
        self._assign_wire_ids(lnodes)
        circ = self._fill_layers(depth_ub, lnodes, nc)
        qc.nwires = self.nwires
        qc.nquad_terms = self.nquad_terms
        qc.nwires_overhead = self.nwires_overhead
        return circ

    def _order_by_layer(self, depth_ub: int):
        qc, F = self.qc, self.F
        # lnode: [desired_wire_id, is_copy_wire, lterms(list of (k, lop0, lop1))]
        lnodes = [[] for _ in range(depth_ub)]
        lops: List[List[int]] = [[] for _ in qc.nodes]
        self.nwires_overhead = 0
        for op, n in enumerate(qc.nodes):
            if n.is_needed and not n.zero():
                d = n.depth
                lop = len(lnodes[d])
                lops[op].append(lop)
                lterms = []
                for (ki, op0, op1) in n.terms:
                    lterms.append((
                        qc.kload(ki),
                        lops[op0][d - 1 - qc.nodes[op0].depth],
                        lops[op1][d - 1 - qc.nodes[op1].depth],
                    ))
                lnodes[d].append([n.desired_wire_id(d, depth_ub), False,
                                  lterms])
                for d2 in range(n.depth + 1, n.max_needed_depth):
                    lop_dm1 = lop
                    lop = len(lnodes[d2])
                    lops[op].append(lop)
                    lnodes[d2].append([n.desired_wire_id(d2, depth_ub), True,
                                       [(F.of_scalar(1), 0, lop_dm1)]])
                    self.nwires_overhead += 1
        return lnodes

    def _elt_key(self, v) -> bytes:
        return self.F.to_bytes(v)

    def _assign_wire_ids(self, lnodes) -> None:
        F = self.F
        for ln in lnodes[0]:
            assert ln[0] != WIRE_ID_UNDEFINED
        for d in range(1, len(lnodes)):
            prev = lnodes[d - 1]
            cur = lnodes[d]
            renamed = []
            for idx, ln in enumerate(cur):
                rlterms = []
                for (k, lop0, lop1) in ln[2]:
                    a = prev[lop0][0]
                    b = prev[lop1][0]
                    rlterms.append((min(a, b), max(a, b), self._elt_key(k)))
                rlterms.sort()
                assert len(set(rlterms)) == len(rlterms), "rlterms not unique"
                renamed.append((ln[0], idx, ln[1], rlterms))

            def sort_key(r):
                wid, idx, is_copy, rlterms = r
                defined = wid != WIRE_ID_UNDEFINED
                # defined ids first, ordered by id; then by reversed-terms
                # lexicographic, shorter first, dag nodes before copy wires
                # (schedule.h:254-293)
                return (
                    0 if defined else 1,
                    wid if defined else 0,
                    tuple(reversed(rlterms)),
                    len(rlterms),
                    1 if is_copy else 0,
                )

            renamed.sort(key=sort_key)
            # uniqueness of (is_copy, rlterms)
            seen = set()
            for (_, _, is_copy, rlterms) in renamed:
                key = (is_copy, tuple(rlterms))
                assert key not in seen, "renamed_at_d not unique"
                seen.add(key)
            for wid, (dwid, idx, _, _) in enumerate(renamed):
                if cur[idx][0] != WIRE_ID_UNDEFINED:
                    assert wid == cur[idx][0], "wid == desired_wire_id"
                else:
                    cur[idx][0] = wid

    def _fill_layers(self, depth_ub: int, lnodes, nc: int) -> Circuit:
        nv = len(lnodes[depth_ub - 1])
        self.nwires = nv
        circ = Circuit(nv=nv, logv=lg(nv), nc=nc, logc=lg(nc),
                       nl=depth_ub - 1, ninputs=0, npub_in=0,
                       subfield_boundary=0, layers=[])
        for d in range(depth_ub - 1, 0, -1):
            nw = len(lnodes[d - 1])
            self.nwires += nw
            circ.layers.append(Layer(
                nw=nw, logw=lg(nw),
                quad=self._mkquad(lnodes[d], lnodes[d - 1])))
        return circ

    def _mkquad(self, lnodes0, lnodes1) -> Quad:
        F = self.F
        ecorners = []
        for ln0 in lnodes0:
            g = ln0[0]
            for (k, lop0, lop1) in ln0[2]:
                h0 = lnodes1[lop0][0]
                h1 = lnodes1[lop1][0]
                ecorners.append([g, min(h0, h1), max(h0, h1), k])
        self.nquad_terms += len(ecorners)
        # canonicalize: morton order on (h0, h1), then g, then elt bytes
        ecorners.sort(key=lambda e: (_morton_key(e[1], e[2]), e[0],
                                     self._elt_key(e[3])))
        # coalesce duplicates (g, h0, h1)
        out = []
        for e in ecorners:
            if out and out[-1][0] == e[0] and out[-1][1] == e[1] and \
                    out[-1][2] == e[2]:
                out[-1][3] = F.add_i(out[-1][3], e[3])
            else:
                out.append(list(e))
        g = np.array([e[0] for e in out], dtype=np.int64)
        h0 = np.array([e[1] for e in out], dtype=np.int64)
        h1 = np.array([e[2] for e in out], dtype=np.int64)
        v = [e[3] for e in out]
        return Quad(g=g, h0=h0, h1=h1, v=v)
