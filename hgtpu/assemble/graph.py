"""Guided de Bruijn assembly with Viterbi graph-coloring phasing.

Port of the reference assembly engine (hisatgenotype_assembly_graph.py):

- AsmNode     <- Node (:176-553): per-position {nt: [count, var_id]}
  sequences w.r.t. the backbone, overlap/combine operations, variant
  extraction.
- viterbi_path <- (:130-173): longest path through the contig trellis.
- AssemblyGraph.guided_debruijn <- guided_DeBruijn (:658-1577): k=60
  positional de Bruijn over read nodes, iterative read filtering by
  mate-support vertex counts, path compression, equivalence-class
  construction and iterative best-pair contig merging into <=2 allele
  strands, then Viterbi annotation against candidate allele nodes.
"""
from __future__ import annotations

import math
import sys

import numpy as np
from collections import deque
from copy import deepcopy

K = 60  # k-mer length (ref: guided_DeBruijn, :661)


def get_major_nt(nt_dic):
    nt = ""
    max_count = 0
    for tmp_nt, (tmp_count, _vid) in nt_dic.items():
        if tmp_count > max_count:
            max_count = tmp_count
            nt = tmp_nt
    return nt


def match_score(nt_dic1, nt_dic2):
    total1 = sum(c for c, _ in nt_dic1.values()) * 2.0
    total2 = sum(c for c, _ in nt_dic2.values()) * 2.0
    best = 0.0
    for nt in "ACGT":
        if nt in nt_dic1 and nt in nt_dic2:
            best = max(best, nt_dic1[nt][0] / total1 + nt_dic2[nt][0] / total2)
    return best


def get_ungapped_seq(seq):
    return [nt_dic for nt_dic in seq if get_major_nt(nt_dic) != "D"]


def get_ungapped_seq_pos(seq, pos):
    tot_del = tot_ins = 0
    for i, nt_dic in enumerate(seq):
        nt = get_major_nt(nt_dic)
        if nt == "D":
            tot_del += 1
        elif nt[0] == "I":
            tot_ins += 1
        if i - tot_ins == pos:
            return pos - tot_del
    return -1


def mate_node_id(node_id):
    base, end = node_id.split("|")
    return "|".join([base, "R" if end == "L" else "L"])


def viterbi_path(trellis, states, verbose=False):
    """Max-plus decode of the contig/allele trellis (ref :130-173).

    The contig trellis carries NO transition costs — the cumulative weight
    of state j at step t is trellis[t][j] plus the best cumulative weight
    of step t-1, a constant across j.  The optimum therefore decomposes
    row-by-row: total score = sum of row maxima, path = each row's argmax
    (ties resolve to the lowest index, as the reference's sequential
    strictly-greater scan does).  One vectorized argmax per (ragged) row
    replaces the O(T x S^2) dynamic program.
    """
    assert trellis and all(len(row) for row in trellis)
    score = 0.0
    path = []
    for row, row_states in zip(trellis, states):
        w = np.asarray(row, dtype=np.float64)
        j = int(np.argmax(w))
        score += float(w[j])
        path.append(row_states[j])
    return score, path


class AsmNode:
    """A read/contig/allele node: positioned nt-dict sequence."""

    def __init__(self, id, left, seq, qual, var, ref_seq, ref_vars, mpileup):
        self.id = id
        self.left = left
        assert len(seq) == len(var)
        self.seq = []
        self.ins_len = 0
        for s in range(len(seq)):
            nt = seq[s]
            if len(nt) == 2:
                self.ins_len += 1
            self.seq.append({nt: [1, var[s]]})
        self.right = self.left + len(seq) - 1 - self.ins_len
        self.read_ids = {id}
        self.mate_ids = {id.split("|")[0]}
        self.ref_seq = ref_seq
        self.ref_vars = ref_vars   # var id -> (type, pos, data)
        self.mpileup = mpileup
        self.calculate_avg_cov()

    # ------------------------------------------------------------------ #
    # Overlap scoring parameters (behavioral constants the reference's
    # contig merge tolerates, assembly_graph.py:241-295 — protected by
    # the bit-identity mandate):
    #   MISMATCH_RATE       tolerated mismatch mass per overlapped base
    #   VAR_CONFLICT_PENALTY extra weight when the two majority bases
    #                        assert different variant identities,
    #                        discounted by how well-covered both are
    #   PROBE_WINDOW        +-bases around the nominal offset searched
    #                        (absorbs indel drift between the nodes)
    MISMATCH_RATE = 0.012
    VAR_CONFLICT_PENALTY = 5.0
    PROBE_WINDOW = 5

    def _ungapped_profile(self):
        """Columnar view of the ungapped sequence for the vectorized
        overlap scan: (majors [L] str, major var ids [L] str, major
        counts [L] f64, 2x total counts [L] f64, ACGT counts [L,4] f64,
        ACGT presence [L,4] bool)."""
        ung = get_ungapped_seq(self.seq)
        L = len(ung)
        majors = np.empty(L, object)
        mvars = np.empty(L, object)
        mcnt = np.empty(L, np.float64)
        tot2 = np.empty(L, np.float64)
        acgt = np.zeros((L, 4), np.float64)
        has = np.zeros((L, 4), bool)
        for i, d in enumerate(ung):
            nt = get_major_nt(d)
            majors[i] = nt
            mvars[i] = d[nt][1]
            mcnt[i] = d[nt][0]
            tot2[i] = sum(c for c, _ in d.values()) * 2.0
            for k, b in enumerate("ACGT"):
                e = d.get(b)
                if e is not None:
                    acgt[i, k] = e[0]
                    has[i, k] = True
        return majors, mvars, mcnt, tot2, acgt, has

    def overlap_with(self, other, skipN=False):
        """Best ungapped placement of `other` onto this node:
        (offset, overlap, mismatch score), or (-1, -1, maxsize).

        The scan probes offsets around the coordinate-implied one and
        accepts the first whose weighted mismatch mass stays within
        MISMATCH_RATE per base — the contig-merge acceptance rule of the
        reference (assembly_graph.py:241-295).  Each probe scores the
        whole window in one vectorized pass; because mismatch
        contributions are non-negative, total <= budget is equivalent to
        the reference's running-sum early exit."""
        assert self.left <= other.left
        if self.right < other.left:
            return -1, -1, sys.maxsize
        ma, va, ca, t2a, aa, ha = self._ungapped_profile()
        mb, vb, cb, t2b, ab, hb = other._ungapped_profile()
        La, Lb = len(ma), len(mb)
        i_left = get_ungapped_seq_pos(self.seq, other.left - self.left)
        avg_a, avg_b = self.get_avg_cov(), other.get_avg_cov()
        for i in range(i_left - self.PROBE_WINDOW,
                       i_left + self.PROBE_WINDOW + 1):
            max_mm = self.MISMATCH_RATE * (La - i)
            w = min(Lb, La - i) if i >= 0 else 0
            if w <= 0:
                # nothing aligns (off the front / past the end): zero
                # mismatch mass trivially passes a positive budget
                if 0.0 <= max_mm:
                    return i, min(La - i, Lb), 0.0
                continue
            sa = slice(i, i + w)
            mism = ma[sa] != mb[:w]
            if skipN:
                mism &= (ma[sa] != "N") & (mb[:w] != "N")
            if not mism.any():
                return i, min(La - i, Lb), 0.0
            # shared-base agreement score: best ACGT mass carried by
            # both columns (match_score)
            both = ha[sa] & hb[:w]
            agree = np.where(both, aa[sa] / t2a[sa, None]
                             + ab[:w] / t2b[:w, None], 0.0).max(axis=1)
            mm = np.where(mism, 1.0 - agree, 0.0)
            # conflicting variant identity: flat penalty, discounted by
            # coverage support of both majors, floored at 1.0
            conflict = mism & (va[sa] != vb[:w])
            adjust = (np.minimum(1.0, ca[sa] / avg_a)
                      * np.minimum(1.0, cb[:w] / avg_b))
            mm = np.where(conflict,
                          np.maximum(1.0, self.VAR_CONFLICT_PENALTY
                                     * adjust), mm)
            tmp_mm = float(mm.sum())
            if tmp_mm <= max_mm:
                return i, min(La - i, Lb), tmp_mm
        return -1, -1, sys.maxsize

    def combine_with(self, other):
        """Absorb `other` (same coordinate frame, self.left <=
        other.left): pool per-position nt counts over the overlap, gap
        any uncovered middle with N columns, append the tail
        (assembly_graph.py:298-377)."""
        if self.left > other.left:
            return
        absorbed = 0                 # positions of `other` already pooled
        if self.right >= other.left:
            # raw index of other.left in self.seq: backbone distance plus
            # the insertion columns encountered on the way
            at, ins_len = 0, 0
            for at, nt_dic in enumerate(self.seq):
                if get_major_nt(nt_dic).startswith("I"):
                    ins_len += 1
                if at == other.left - self.left + ins_len:
                    break
            for dst, src in zip(self.seq[at:], other.seq):
                for nt, (count, var_id) in src.items():
                    hit = dst.get(nt)
                    if hit is not None:
                        hit[0] += count
                    else:
                        dst[nt] = [count, var_id]
                absorbed += 1
        else:
            self.seq.extend({"N": [1, ""]}
                            for _ in range(other.left - self.right - 1))
        if absorbed < len(other.seq):
            self.seq.extend(deepcopy(other.seq[absorbed:]))
        self.read_ids |= other.read_ids
        self.mate_ids |= other.mate_ids
        self.ins_len = sum(
            1 for nt_dic in self.seq if get_major_nt(nt_dic)[0] == "I")
        self.right = self.left + len(self.seq) - 1 - self.ins_len
        self.calculate_avg_cov()

    def ungapped_length(self):
        return len(get_ungapped_seq(self.seq))

    def contain_Ns(self):
        return any(get_major_nt(d) == "N" for d in self.seq)

    def get_var_ids(self, left=0, right=sys.maxsize):
        """Variant ids expressed by the node's major bases (ref :393-421)."""
        vars = []
        left = max(left, self.left)
        right = min(right, self.right)
        ins_len = 0
        for pos in range(left, right + 1):
            var_i = pos - self.left + ins_len
            nt_dic = None
            while var_i < len(self.seq):
                nt_dic = self.seq[var_i]
                nt = get_major_nt(nt_dic)
                if nt.startswith("I"):
                    var_i += 1
                    ins_len += 1
                else:
                    break
            if nt_dic is None:
                continue
            nt = get_major_nt(nt_dic)
            for _, var in nt_dic.values():
                if var in ("", "unknown") or var not in self.ref_vars:
                    continue
                if vars and var == vars[-1]:
                    continue
                vtype, _vpos, vdata = self.ref_vars[var]
                if (vtype == "single" and vdata == nt) \
                        or (vtype == "deletion" and nt == "D") \
                        or (vtype == "insertion" and len(nt) == 2
                            and nt[1] == vdata):
                    vars.append(var)
        return vars

    def get_avg_cov(self):
        return self.avg

    def calculate_avg_cov(self):
        self.avg = sum(c for nt_dic in self.seq
                       for c, _ in nt_dic.values()) / max(1, len(self.seq))
        return self.avg

    def get_seq(self):
        out = []
        for nt_dic in self.seq:
            nt = get_major_nt(nt_dic)
            if nt[0] == "I":
                out.append(nt[1])
            elif nt != "D":
                out.append(nt)
            else:
                out.append("D")
        return "".join(c for c in out if c != "D")


class AssemblyGraph:
    def __init__(self, backbone, ref_vars, exons, primary_exons,
                 true_allele_nodes=None, predicted_allele_nodes=None):
        self.backbone = backbone
        self.ref_vars = ref_vars
        self.exons = exons
        self.primary_exons = primary_exons
        self.true_allele_nodes = true_allele_nodes or {}
        self.predicted_allele_nodes = predicted_allele_nodes or {}
        self.allele_node_order = []
        self.nodes = {}
        self.nodes2 = None
        self.other_nodes = {}
        self.coverage = {}

    def add_node(self, id, id_i, node):
        if id_i == 0:
            if id in self.nodes:
                return
            self.nodes[id] = node
        else:
            self.other_nodes.setdefault(id, []).append(node)

    # ------------------------------------------------------------------ #
    def remove_nodes(self, nodes):
        """Drop nodes contained in others or with low coverage
        (ref :621-653)."""
        delete_ids = set()
        node_list = sorted(
            ([id, n.left, n.right] for id, n in nodes.items()),
            key=lambda x: (x[2], x[1]))
        for n in range(len(node_list)):
            id, left, right = node_list[n]
            node = nodes[id]
            i = n - 1
            while i >= 0:
                id2, left2, right2 = node_list[i]
                if right2 < left:
                    break
                node2 = nodes[id2]
                if left <= left2 and right2 <= right:
                    at, overlap, mm = node.overlap_with(node2)
                    if mm < 1.0:
                        mult = overlap / float(max(right - left,
                                                   right2 - left2))
                        if node2.get_avg_cov() * mult * 10 < node.get_avg_cov():
                            delete_ids.add(id2)
                        elif left == left2 and right == right2:
                            delete_ids.add(id)
                    elif overlap > 0:
                        if node2.get_avg_cov() * 10 < node.get_avg_cov():
                            delete_ids.add(id2)
                        elif node.get_avg_cov() * 10 < node2.get_avg_cov():
                            delete_ids.add(id)
                i -= 1
        for did in delete_ids:
            del nodes[did]

    # ------------------------------------------------------------------ #
    def guided_debruijn(self):
        """Full guided de Bruijn assembly (ref :658-1577).  Returns
        [best allele pair, log10 group score]."""
        assert len(self.nodes) > 0
        k = K
        node_seq = {}

        def add_node_seq(id):
            nodes = [self.nodes[id]] + self.other_nodes.get(id, [])
            for node_i, node in enumerate(nodes):
                seq = []
                for nt_dic in node.seq:
                    nt = get_major_nt(nt_dic)
                    if nt in "ACGTND":
                        seq.append(nt)
                if len(seq) < k:
                    continue
                node_seq["%s.%d" % (id, node_i)] = seq

        for id in self.nodes:
            add_node_seq(id)

        def id_and_sub(id):
            parts = id.split(".")
            return ".".join(parts[:-1]), int(parts[-1])

        # ---- build & iteratively clean the positional de Bruijn graph --- #
        try_hard = False
        debruijn = []
        num_to_id = []
        while True:
            delete_ids = set()
            nodes = []
            for id, node in self.nodes.items():
                nodes_ = [node] + self.other_nodes.get(id, [])
                for node_i, nd in enumerate(nodes_):
                    id_ = "%s.%d" % (id, node_i)
                    if id_ not in node_seq:
                        continue
                    seq = node_seq[id_]
                    if len(seq) < k or "N" in seq:
                        continue
                    nodes.append([id_, nd.left, nd.right, seq[:k], seq[k:]])
            nodes.sort(key=lambda x: (x[1], x[2]))
            num_to_id = [nd[0] for nd in nodes]

            debruijn = [[] for _ in range(len(self.backbone) - k + 1)]
            min_n = 0
            for pos in range(len(debruijn)):
                for n in range(min_n, len(nodes)):
                    id, node_pos, node_right, kmer, seq = nodes[n]
                    if node_pos < pos:
                        min_n = n + 1
                        continue
                    elif node_pos > pos:
                        break
                    curr = debruijn[pos]
                    found = False
                    kmer_seq = "".join(kmer)
                    for v in range(len(curr)):
                        cmp_nt, cmp_km1 = curr[v][:2]
                        if kmer_seq == cmp_km1 + cmp_nt:
                            curr[v][3].append(n)
                            found = True
                            break
                    if not found:
                        preds = []
                        if pos > 0:
                            for v, vert in enumerate(debruijn[pos - 1]):
                                cmp_nt, cmp_km1 = vert[:2]
                                if kmer_seq[:-1] == cmp_km1[1:] + cmp_nt:
                                    preds.append(v)
                        debruijn[pos].append(
                            [kmer_seq[-1], kmer_seq[:-1], preds, [n]])
                    if len(seq) > 0:
                        nodes[n] = [id, node_pos + 1, node_right,
                                    kmer[1:] + seq[:1], seq[1:]]

            # ---- filter reads at branch positions (ref :822-955) ---- #
            for pos in range(len(debruijn)):
                vertices = debruijn[pos]
                num_vertices = sum(
                    1 for v in vertices if not (set(v[3]) <= delete_ids))
                if num_vertices <= 1:
                    continue
                vertice_count = [0] * len(vertices)
                for v, vert in enumerate(vertices):
                    for num_id in vert[3]:
                        if num_id in delete_ids:
                            continue
                        read_id = id_and_sub(num_to_id[num_id])[0]
                        if read_id in self.other_nodes:
                            continue
                        if mate_node_id(read_id) in self.nodes:
                            vertice_count[v] += 1

                first_pair = None
                for v in range(len(vertices)):
                    rids = {id_and_sub(num_to_id[ni])[0]
                            for ni in vertices[v][3]}
                    for v2 in range(v + 1, len(vertices)):
                        rids2 = {id_and_sub(num_to_id[ni])[0]
                                 for ni in vertices[v2][3]}
                        if rids & rids2:
                            first_pair = [v, v2, rids & rids2]
                            break

                if try_hard:
                    order = sorted(range(len(vertice_count)),
                                   key=lambda v: vertice_count[v])
                    for v in order[:-2]:
                        delete_ids |= set(vertices[v][3])
                else:
                    if first_pair:
                        v, v2, multi = first_pair
                        v_ = v if vertice_count[v] < vertice_count[v2] else v2
                        for ni in vertices[v_][3]:
                            if id_and_sub(num_to_id[ni])[0] in multi:
                                delete_ids.add(ni)
                    else:
                        if len(vertices) == 2:
                            for v in range(2):
                                relative_avg = (sum(vertice_count)
                                                - vertice_count[v]) \
                                    / float(len(vertice_count) - 1)
                                if vertice_count[v] * 2 < relative_avg:
                                    nt, _, _, num_ids = vertices[1 - v]
                                    if nt == "D":
                                        # deletion-conflict resolution
                                        # (ref :899-932)
                                        ni = num_ids[0]
                                        id_sub = num_to_id[ni]
                                        id, sub = id_and_sub(id_sub)
                                        nd = self.nodes[id] if sub == 0 \
                                            else self.other_nodes[id][sub - 1]
                                        left = pos - nd.left
                                        seqr = "".join(
                                            node_seq[id_sub][left + k:]) \
                                            .replace("D", "")
                                        success = True
                                        for ni2 in vertices[v][3]:
                                            id_sub2 = num_to_id[ni2]
                                            id2, sub2 = id_and_sub(id_sub2)
                                            nd2 = self.nodes[id2] if sub2 == 0 \
                                                else self.other_nodes[id2][sub2 - 1]
                                            left2 = pos - nd2.left
                                            seq2r = "".join(
                                                node_seq[id_sub2][left2 + k:])
                                            if seqr.find(seq2r) != 0:
                                                success = False
                                                break
                                        if success:
                                            delete_ids |= set(vertices[v][3])
                        else:
                            second2last = sorted(vertice_count)[1]
                            for v in range(len(vertices)):
                                if vertice_count[v] < second2last:
                                    delete_ids |= set(vertices[v][3])

            # ---- apply deletions (ref :957-1000) ---- #
            ids_to_update = set()
            for ni in delete_ids:
                id_sub = num_to_id[ni]
                id, sub = id_and_sub(id_sub)
                ids_to_update.add(id)
                if sub == 0:
                    self.nodes[id] = None
                else:
                    self.other_nodes[id][sub - 1] = None
            purge = []
            for id in list(self.nodes.keys()):
                others = [o for o in self.other_nodes.get(id, []) if o is not None]
                if self.nodes[id] is None:
                    if not others:
                        purge.append(id)
                    else:
                        self.nodes[id] = others[0]
                        others = others[1:]
                if id in self.other_nodes:
                    if not others:
                        del self.other_nodes[id]
                    else:
                        self.other_nodes[id] = others
            for id in purge:
                del self.nodes[id]
            for id in ids_to_update:
                if id in self.nodes:
                    add_node_seq(id)
            if len(delete_ids) == 0:
                if try_hard:
                    break
                try_hard = True

        # ---- regroup ids (ref :1040-1047) ---- #
        id_to_num = {}
        for num in range(len(num_to_id)):
            id = id_and_sub(num_to_id[num])[0]
            num_to_id[num] = id
            id_to_num.setdefault(id, set()).add(num)

        # ---- compress paths (ref :1049-1112) ---- #
        paths = []
        path_queue = deque()
        done = set()
        for i in range(len(debruijn)):
            if len(debruijn[i]) == 0:
                continue
            for i2 in range(len(debruijn[i])):
                path_queue.append("%d-%d" % (i, i2))
            break
        while path_queue:
            i_str = path_queue.popleft()
            if i_str in done:
                continue
            i, i2 = map(int, i_str.split("-"))
            num_ids = debruijn[i][i2][3]
            j = i + 1
            while j < len(debruijn):
                merge = len(debruijn[j - 1]) > len(debruijn[j])
                branch = len(debruijn[j - 1]) < len(debruijn[j])
                new_i2 = -1
                tmp_num_ids = []
                found = False
                for j2 in range(len(debruijn[j])):
                    _, _, preds, add_ids = debruijn[j][j2]
                    if len(preds) == 0:
                        branch = True
                        path_queue.append("%d-%d" % (j, j2))
                    elif i2 in preds:
                        found = True
                        if len(preds) > 1:
                            merge = True
                        if new_i2 >= 0:
                            branch = True
                        new_i2 = j2
                        tmp_num_ids += add_ids
                if merge or branch:
                    for j2 in range(len(debruijn[j])):
                        if i2 in debruijn[j][j2][2]:
                            path_queue.append("%d-%d" % (j, j2))
                    break
                if not found:
                    break
                num_ids += tmp_num_ids
                i2 = new_i2
                j += 1
            done.add(i_str)
            paths.append([i, j, set(num_ids)])
            if j < len(debruijn) and len(debruijn[j]) == 0:
                j += 1
                while j < len(debruijn) and len(debruijn[j]) == 0:
                    j += 1
                if j < len(debruijn):
                    for j2 in range(len(debruijn[j])):
                        path_queue.append("%d-%d" % (j, j2))

        def get_mate_num_ids(num_ids):
            out = set()
            for ni in num_ids:
                m = mate_node_id(num_to_id[ni])
                if m in id_to_num:
                    out |= id_to_num[m]
            return out

        # ---- equivalence classes (ref :1126-1169) ---- #
        paths.sort(key=lambda x: (x[0], x[1]))
        excl_num_ids = set()
        equiv_list = []
        p = 0
        while p < len(paths):
            left, right, num_ids = paths[p]
            p2 = p + 1
            while p2 < len(paths):
                if paths[p2][0] >= right:
                    break
                p2 += 1
            equiv_list.append([])
            for i in range(p, p2):
                _, _, nids = paths[i]
                equiv_list[-1].append(
                    [[i], nids, nids | get_mate_num_ids(nids), set()])
                if p + 1 < p2:
                    excl_num_ids |= nids
            p = p2
        new_equiv = []
        for classes in equiv_list:
            if len(classes) > 1:
                new_equiv.append(classes)
                continue
            nids = classes[0][1] - excl_num_ids
            if len(nids) <= 0:
                continue
            classes[0][1] = nids
            classes[0][2] = nids | get_mate_num_ids(nids)
            new_equiv.append(classes)
        equiv_list = new_equiv

        # ---- iterative merge + phasing (ref :1171-1577) ---- #
        known_alleles = False
        v_coloring = None

        def annotate_contig_viterbi():
            def jaccard(sa, sb):
                sa, sb = set(sa), set(sb)
                return math.log10(
                    float(len(sa & sb) + 1) / float(len(sa | sb) + 1))

            alleles = list(self.predicted_allele_nodes.keys())
            vit_key, vit_val, vit_path = [], [], []
            for i in range(len(alleles)):
                an0 = self.predicted_allele_nodes[alleles[i]]
                for j in range(i, len(alleles)):
                    vit_key.append([alleles[i], alleles[j]])
                    an1 = self.predicted_allele_nodes[alleles[j]]
                    trellis, states = [], []
                    for kk in range(len(equiv_list)):
                        classes = equiv_list[kk]
                        mx = []
                        for l in range(len(classes)):
                            mx.append([])
                            ni = sorted(classes[l][1])[0]
                            node_id = "(%d-%d)%s" % (kk, l, num_to_id[ni])
                            node = self.nodes2[node_id]
                            nvars = node.get_var_ids()
                            for an in (an0, an1):
                                avars = an.get_var_ids(node.left, node.right)
                                mx[-1].append(jaccard(nvars, avars))
                        if len(mx) > 1:
                            state = [[0, 1], [1, 0]]
                            mx[1] = mx[1][::-1]
                            mx = [sum(z) for z in zip(*mx)]
                        else:
                            state = [[0, 0], [0, 0]]
                            mx = mx[0]
                        states.append(state)
                        trellis.append(mx)
                    score, path = viterbi_path(trellis, states)
                    vit_path.append(path)
                    vit_val.append(score)
            ix = max(range(len(vit_val)), key=vit_val.__getitem__)
            best_alleles = vit_key[ix]
            best_path = vit_path[ix]
            for i in range(len(equiv_list)):
                classes = equiv_list[i]
                for j in range(len(best_path[i])):
                    classes[best_path[i][j]][3].add(best_alleles[j])
            return [best_alleles, vit_val[ix]]

        while True:
            if known_alleles:
                if not self.predicted_allele_nodes:
                    break
                v_coloring = annotate_contig_viterbi()

            best_common_mat = []
            best_stat = -sys.maxsize
            best_i = best_i2 = -1
            for i in range(len(equiv_list) - 1):
                classes = equiv_list[i]
                for i2 in range(i + 1, len(equiv_list)):
                    classes2 = equiv_list[i2]
                    common_mat = []
                    for j in range(len(classes)):
                        common_mat.append([])
                        ids = classes[j][3] if known_alleles else classes[j][2]
                        for j2 in range(len(classes2)):
                            ids2 = classes2[j2][3] if known_alleles \
                                else classes2[j2][2]
                            common_mat[-1].append(len(ids & ids2))
                    common_stat = 0
                    if len(classes) == 1 or len(classes2) == 1:
                        for row in common_mat:
                            common_stat += sum(row)
                    else:
                        for row in common_mat:
                            srow = sorted(row, reverse=True)
                            common_stat += srow[0] - srow[1]
                        if common_mat[0][0] + common_mat[1][1] \
                                == common_mat[1][0] + common_mat[0][1]:
                            common_stat = -1
                    if common_stat > best_stat:
                        best_common_mat = common_mat
                        best_stat = common_stat
                        best_i, best_i2 = i, i2

            if known_alleles and best_stat < 0:
                self.remove_nodes(self.nodes2)
                break
            if best_stat < 0:
                # collapse classes into contig nodes (ref :1352-1382)
                known_alleles = True
                new_nodes = {}
                for i in range(len(equiv_list)):
                    classes = equiv_list[i]
                    for j in range(len(classes)):
                        nids = sorted(classes[j][1])
                        read_id = num_to_id[nids[0]]
                        node = deepcopy(self.nodes[read_id])
                        for ni2 in nids[1:]:
                            node.combine_with(self.nodes[num_to_id[ni2]])
                        new_id = "(%d-%d)%s" % (i, j, read_id)
                        node.id = new_id
                        new_nodes[new_id] = node
                self.nodes = new_nodes
                self.nodes2 = deepcopy(self.nodes)
                self.remove_nodes(self.nodes)
                continue

            mat = best_common_mat
            classes = equiv_list[best_i]
            classes2 = equiv_list[best_i2]

            def del_row(cl, m, r):
                return cl[:r] + cl[r + 1:], m[:r] + m[r + 1:]

            def del_col(cl, m, c):
                return cl[:c] + cl[c + 1:], [row[:c] + row[c + 1:] for row in m]

            assert len(classes) <= 2 and len(classes2) <= 2
            if len(classes) == 2 and len(classes2) == 2:
                n1, n2 = len(classes[0][1]), len(classes[1][1])
                if n1 * 6 < n2 or n2 * 6 < n1:
                    rs1, rs2 = sum(mat[0]), sum(mat[1])
                    if rs1 > max(2, rs2 * 6):
                        classes, mat = del_row(classes, mat, 1)
                        classes[0][1] -= excl_num_ids
                    elif rs2 > max(2, rs1 * 6):
                        classes, mat = del_row(classes, mat, 0)
                        classes[0][1] -= excl_num_ids
                if len(classes) == 2:
                    n1, n2 = len(classes2[0][1]), len(classes2[1][1])
                    if n1 * 6 < n2 or n2 * 6 < n1:
                        cs1 = mat[0][0] + mat[1][0]
                        cs2 = mat[0][1] + mat[1][1]
                        if cs1 > max(2, cs2 * 6):
                            classes2, mat = del_col(classes2, mat, 1)
                            classes2[0][1] -= excl_num_ids
                        elif cs2 > max(2, cs1 * 6):
                            classes2, mat = del_col(classes2, mat, 0)
                            classes2[0][1] -= excl_num_ids

            merge_list = []
            copy_list = []
            remove_list = []

            def add_merge(cl, cl2, i, j, kk):
                if known_alleles:
                    ni1 = sorted(cl[i][1])[0]
                    ni2 = sorted(cl2[j][1])[0]
                    merge_list.append([
                        "(%d-%d)%s" % (best_i, i, num_to_id[ni1]),
                        "(%d-%d)%s" % (best_i2, j, num_to_id[ni2]),
                        "(%d-%d)%s" % (best_i, kk, num_to_id[min(ni1, ni2)])])
                cl[i][0] = sorted(cl[i][0] + cl2[j][0])
                cl[i][1] |= cl2[j][1]

            def add_copy(cl, cl2, i, j, kk):
                if known_alleles:
                    ni = sorted(cl2[j][1])[0]
                    copy_list.append([
                        "(%d-%d)%s" % (best_i2, j, num_to_id[ni]),
                        "(%d-%d)%s" % (best_i, kk, num_to_id[ni])])
                cl[i] = cl2[j]

            def add_remove(cl, i):
                if known_alleles:
                    ni = sorted(cl[i][1])[0]
                    remove_list.append("(%d-%d)%s" % (best_i, i, num_to_id[ni]))

            broke = False
            if len(classes) == 1 and len(classes2) == 1:
                add_merge(classes, classes2, 0, 0, 0)
            elif len(classes) == 1:
                if 0 not in classes[0][0] \
                        and mat[0][0] > max(2, mat[0][1] * 6) \
                        and len(classes2[0][1]) > len(classes2[1][1]) * 2:
                    add_merge(classes, classes2, 0, 0, 0)
                elif 0 not in classes[0][0] \
                        and mat[0][1] > max(2, mat[0][0] * 6) \
                        and len(classes2[1][1]) > len(classes2[0][1]) * 2:
                    add_merge(classes, classes2, 0, 1, 0)
                else:
                    classes.append(deepcopy(classes[0]))
                    if 0 in classes[0][0] and len(classes[0][0]) == 1 \
                            and (mat[0][0] > mat[0][1] * 2
                                 or mat[0][1] > mat[0][0] * 2):
                        if mat[0][0] > mat[0][1]:
                            add_merge(classes, classes2, 0, 0, 0)
                            add_copy(classes, classes2, 1, 1, 1)
                        else:
                            add_copy(classes, classes2, 0, 0, 0)
                            add_merge(classes, classes2, 1, 1, 1)
                    else:
                        add_merge(classes, classes2, 0, 0, 0)
                        add_merge(classes, classes2, 1, 1, 1)
            elif len(classes2) == 1:
                if mat[0][0] > max(2, mat[1][0] * 6):
                    add_merge(classes, classes2, 0, 0, 0)
                    if len(classes[0][1]) > len(classes[1][1]) * 6:
                        add_remove(classes, 1)
                elif mat[1][0] > max(2, mat[0][0] * 6):
                    add_merge(classes, classes2, 1, 0, 0)
                    if len(classes[1][1]) > len(classes[0][1]) * 6:
                        add_remove(classes, 0)
                else:
                    add_merge(classes, classes2, 0, 0, 0)
                    add_merge(classes, classes2, 1, 0, 1)
            else:
                score00 = mat[0][0] + mat[1][1]
                score01 = mat[0][1] + mat[1][0]
                if score00 > score01:
                    add_merge(classes, classes2, 0, 0, 0)
                    add_merge(classes, classes2, 1, 1, 1)
                elif score00 < score01:
                    add_merge(classes, classes2, 0, 1, 0)
                    add_merge(classes, classes2, 1, 0, 1)
                else:
                    broke = True
            if broke:
                break

            for c in range(len(classes)):
                classes[c][2] = classes[c][1] | get_mate_num_ids(classes[c][1])
            equiv_list[best_i] = classes
            equiv_list = equiv_list[:best_i2] + equiv_list[best_i2 + 1:]

            if known_alleles:
                exclude_ids = set()
                new_nodes = {}
                for nid1, nid2, nid3 in merge_list:
                    if self.nodes2[nid1].left <= self.nodes2[nid2].left:
                        node = deepcopy(self.nodes2[nid1])
                        node2 = self.nodes2[nid2]
                    else:
                        node = deepcopy(self.nodes2[nid2])
                        node2 = self.nodes2[nid1]
                    node.combine_with(node2)
                    node.id = nid3
                    new_nodes[nid3] = node
                    exclude_ids |= {nid1, nid2}
                for nid1, nid2 in copy_list:
                    node = self.nodes2[nid1]
                    node.id = nid2
                    new_nodes[nid2] = node
                    exclude_ids.add(nid1)
                exclude_ids |= set(remove_list)
                for node_id, node in self.nodes2.items():
                    if node_id in exclude_ids:
                        continue
                    num, id = node_id.split(")", 1)
                    i, i2 = map(int, num[1:].split("-"))
                    if i > best_i2:
                        i -= 1
                    nid = "(%d-%d)%s" % (i, i2, id)
                    node.id = nid
                    new_nodes[nid] = node
                self.nodes2 = new_nodes

        if known_alleles and v_coloring is not None:
            return v_coloring
        return [["No Known alleles to match"], -1]

    # ------------------------------------------------------------------ #
    def calculate_coverage(self, simulation=False):
        """Per-allele coverage profile for drawing (ref :1688-1743)."""
        allele_nodes = self.true_allele_nodes if simulation \
            else self.predicted_allele_nodes
        anode_list = [[id, n.left, n.right] for id, n in allele_nodes.items()]
        coverage = {id: [0.0] * len(self.backbone) for id, _, _ in anode_list}
        for id, node in self.nodes.items():
            nodes2 = [node] + self.other_nodes.get(id, [])
            for nd in nodes2:
                left, right = nd.left, nd.right
                nvars = nd.get_var_ids()
                max_common = -sys.maxsize
                max_ids = []
                for aid, aleft, aright in anode_list:
                    if right - left <= 500 and (left < aleft or right > aright):
                        continue
                    avars = allele_nodes[aid].get_var_ids(left, right)
                    tmp = len(set(nvars) & set(avars)) \
                        - len(set(nvars) | set(avars))
                    if tmp > max_common:
                        max_common = tmp
                        max_ids = [aid]
                    elif tmp == max_common:
                        max_ids.append(aid)
                if not max_ids:
                    continue
                add_cov = 1.0 / len(nodes2) / len(max_ids)
                for aid in max_ids:
                    for p in range(left, min(right + 1, len(self.backbone))):
                        coverage[aid][p] += add_cov
        max_cov = max((max(c) for c in coverage.values()), default=0.0)
        if max_cov > 0:
            coverage = {a: [x / max_cov for x in c]
                        for a, c in coverage.items()}
        self.coverage = coverage
        return coverage
