"""Alternative-haplotype ambiguity machinery.

Port of the reference's equivalence engine (the piece that decides
bit-identical counting):

- `get_alternatives` (typing_common.py:1424-1657): for every deletion
  variant, recursively discover haplotype spellings that produce the same
  sequence (deletions sliding through repeats), in both directions.
  Returns {ht string: set(equivalent ht strings)} for left- and
  right-anchored spellings.
- `identify_ambigious_diffs` (typing_common.py:1663-1955): per read, trim
  the cmp list ends whose spelling is ambiguous and emit every equivalent
  end spelling, so reads contribute evidence to all alleles that could
  have produced them.

Haplotype strings follow the reference format
"<left>-<var id>-...-<right>" with catalog ids ("hv<N>") and novel ids
("nv<N>"); the counting layer parses them back.
"""
from __future__ import annotations

from ..db.catalog import GeneRef, VT_SINGLE, VT_DELETION, VT_INSERTION

_TYPE_NAME = {VT_SINGLE: "single", VT_DELETION: "deletion",
              VT_INSERTION: "insertion"}


class VarTable:
    """var id -> ("single"|"deletion"|"insertion", pos, data) resolving
    catalog hv ids and per-run novel nv ids."""

    def __init__(self, gene: GeneRef, novel=None):
        self.gene = gene
        self.novel = novel or {}

    def __getitem__(self, var_id):
        if var_id.startswith("hv"):
            vi = self.gene.var_index(var_id)
            g = self.gene
            return (_TYPE_NAME[int(g.var_type[vi])], int(g.var_pos[vi]),
                    g.var_data[vi])
        return self.novel[var_id]

    def __contains__(self, var_id):
        return (var_id.startswith("hv") and
                var_id in self.gene._id2idx) or var_id in self.novel


def _lower_bound(lst, pos):
    """First index whose [0] >= pos (ref: lower_bound,
    typing_common.py:406-422)."""
    lo, hi = 0, len(lst)
    while lo < hi:
        mid = (lo + hi) // 2
        if lst[mid][0] < pos:
            lo = mid + 1
        else:
            hi = mid
    return lo


def get_alternatives(gene: GeneRef, verbose=False):
    """Compute (Alts_left, Alts_right) equivalence dictionaries."""
    ref_seq = gene.backbone
    Vars = VarTable(gene)
    var_list = [(int(gene.var_pos[i]), gene.var_ids[i])
                for i in range(gene.n_vars)]

    alts_left = {}
    alts_right = {}

    # consecutive variant pairs observed in real alleles
    import numpy as np
    second_order = set()
    for a in range(gene.n_alleles):
        idxs = np.flatnonzero(gene.links[:, a])
        for k in range(len(idxs) - 1):
            second_order.add((gene.var_ids[idxs[k]], gene.var_ids[idxs[k + 1]]))

    # variants indexed by their rightmost coordinate
    rev_var_list = []
    for _, vid in var_list:
        vt, vp, vd = Vars[vid]
        if vt == "deletion":
            vp = vp + int(vd) - 1
        elif vt == "insertion":
            vp += 1
        rev_var_list.append((vp, vid))
    rev_var_list.sort(key=lambda x: x[0])

    def nextbases(ht, left=True, exclude=()):
        """Extend a haplotype [left, ids..., right] by one base outward;
        returns [(new ht, base)] for every spelling of that base."""
        if left:
            pos = int(ht[0]) - 1
        else:
            pos = ht[-1] + 1
        if pos < 0 or pos >= len(ref_seq):
            return []
        if left:
            bases = [([pos] + ht[1:], ref_seq[pos])]
            prev_id = ht[1] if len(ht) > 2 else None
            vi = _lower_bound(rev_var_list, pos + 1)
            for vj in reversed(range(vi)):
                _, vid = rev_var_list[vj]
                vt, vp, vd = Vars[vid]
                if vt == "deletion":
                    if vp == 0:
                        continue
                    vp = vp + int(vd) - 1
                if vp > pos:
                    continue
                if vp < pos:
                    break
                if vid in exclude:
                    continue
                if prev_id and (vid, prev_id) not in second_order:
                    continue
                if vt == "single":
                    bases.append(([vp, vid] + ht[1:], vd))
                elif vt == "deletion":
                    bases += nextbases([vp - int(vd) + 1, vid] + ht[1:],
                                       left, exclude)
        else:
            bases = [(ht[:-1] + [pos], ref_seq[pos])]
            prev_id = ht[-2] if len(ht) > 2 else None
            vi = _lower_bound(var_list, pos)
            for vj in range(vi, len(var_list)):
                _, vid = var_list[vj]
                vt, vp, vd = Vars[vid]
                if vp < pos:
                    continue
                if vp > pos:
                    break
                if vid in exclude:
                    continue
                if prev_id and (prev_id, vid) not in second_order:
                    continue
                if vt == "single":
                    bases.append((ht[:-1] + [vid, vp], vd))
                elif vt == "deletion":
                    bases += nextbases(ht[:-1] + [vid, vp + int(vd) - 1],
                                       left, exclude)
        return bases

    def ht_str(ht):
        if len(ht) <= 2:
            return "%d-%d" % (ht[0], ht[1])
        return "%d-%s-%d" % (ht[0], "-".join(ht[1:-1]), ht[-1])

    def recur(del_id, ht, ht_alt, left=True, dep=0):
        bases1 = nextbases(ht, left)
        bases2 = nextbases(ht_alt, left, (del_id,))
        found = False
        for nht, bp in bases1:
            for nht_alt, bp2 in bases2:
                if bp != bp2:
                    continue
                if left:
                    if int(nht[0]) == int(nht_alt[0]):
                        continue
                else:
                    if int(nht[-1]) == int(nht_alt[-1]):
                        continue
                found = True
                recur(del_id, nht, nht_alt, left, dep + 1)
        if dep > 0 and not found:
            s1, s2 = ht_str(ht), ht_str(ht_alt)
            store = alts_left if left else alts_right
            store.setdefault(s1, set()).add(s2)
            store.setdefault(s2, set()).add(s1)

    for _, vid in var_list:
        vt, vp, vd = Vars[vid]
        if vp == 0 or vt != "deletion":
            continue
        dl = int(vd)
        if vp + dl >= len(ref_seq):
            continue
        recur(vid, [vp, vid, vp + dl - 1], [vp + dl, vp + dl - 1], True)
        recur(vid, [vp, vid, vp + dl - 1], [vp, vp - 1], False)

    return alts_left, alts_right


def alts_sorted_lists(alts_left, alts_right):
    """(pos, ht-string) lists sorted for the trimming scan
    (ref: haplotype_alts_list, typing_core.py:584-596)."""
    left_list = sorted(
        ((int(h.split("-")[-1]), h) for h in alts_left), key=lambda x: x[0])
    right_list = sorted(
        ((int(h.split("-")[0]), h) for h in alts_right), key=lambda x: x[0])
    return left_list, right_list


def identify_ambiguous_diffs(ref_seq, Vars, alts_left, alts_right,
                             alts_left_list, alts_right_list, cmp_list,
                             verbose=0):
    """Trim ambiguous read ends; returns
    (cmp_left, cmp_right, left_alt_strs, right_alt_strs).

    cmp_list entries: [type, pos, length, var_id_str] (reference format).
    """
    cmp_left = 0
    cmp_right = len(cmp_list) - 1
    left = cmp_list[0][1]
    right = cmp_list[-1][1] + cmp_list[-1][2] - 1
    left_alt_set = set()
    right_alt_set = set()

    def ht_and_seq(cl):
        ht = []
        seq = ""
        for c in cl:
            typ, pos, length = c[:3]
            vid = c[3] if len(c) > 3 else ""
            if typ == "match":
                seq += ref_seq[pos:pos + length]
            elif typ == "mismatch":
                seq += ref_seq[pos]
            if vid not in ("", "unknown"):
                ht.append(vid)
        return ht, seq

    # ---- left end ---- #
    found = False
    for i in reversed(range(len(cmp_list))):
        i_found = False
        typ, cur_left, length = cmp_list[i][:3]
        vid = cmp_list[i][3] if typ in ("mismatch", "deletion") else ""
        if typ in ("mismatch", "deletion", "insertion") \
                and not str(vid).startswith("hv"):
            continue
        cur_right = cur_left + length - 1 if typ in ("match", "deletion") \
            else cur_left
        cur_ht, cur_seq = ht_and_seq(cmp_list[:i + 1])
        cur_ht_str = str(left) if not cur_ht \
            else "%d-%s" % (left, "-".join(cur_ht))
        ht_i = _lower_bound(alts_left_list, cur_right + 1)
        for ht_j in reversed(range(min(ht_i + 1, len(alts_left_list)))):
            ht_pos, ht = alts_left_list[ht_j]
            if ht_pos < cur_left:
                break
            if ht_pos > cur_right:
                continue
            if cur_ht and ht.find("-".join(cur_ht)) == -1:
                continue
            parts = ht.split("-")[:-1]
            if len(cur_ht) + 1 == len(parts):
                if left < int(parts[0]):
                    continue
            else:
                vid2 = parts[len(parts) - len(cur_ht) - 1]
                vt2, vp2, vd2 = Vars[vid2]
                if vt2 == "deletion":
                    vp2 = vp2 + int(vd2) - 1
                if left <= vp2:
                    continue
            i_found = True
            rep_ht = alts_left_list[ht_j][1]
            for alt_ht_str in alts_left[rep_ht]:
                alt = alt_ht_str.split("-")
                alt_right = int(alt[-1])
                assert alt_right <= cur_right
                seq_pos = cur_right - alt_right
                cur_pos = alt_right
                part = []
                for vid_ in reversed(alt[1:-1]):
                    vt_, vp_, vd_ = Vars[vid_]
                    if vt_ == "deletion":
                        dl = int(vd_)
                        vp_ = vp_ + dl - 1
                    assert vp_ <= cur_pos
                    nsp = seq_pos + (cur_pos - vp_)
                    if nsp >= len(cur_seq):
                        break
                    if vt_ == "single":
                        nsp += 1
                        ncp = vp_ - 1
                    else:
                        ncp = vp_ - dl
                    part.insert(0, vid_)
                    if nsp >= len(cur_seq):
                        break
                    seq_pos, cur_pos = nsp, ncp
                if part:
                    seq_left = len(cur_seq) - seq_pos - 1
                    tail = ""
                    if found:
                        mids = [c[3] for c in cmp_list[i + 1:cmp_left]
                                if c[0] in ("mismatch", "deletion",
                                            "insertion")
                                and str(c[3]).startswith("hv")]
                        if mids:
                            tail = "-" + "-".join(mids)
                    left_alt_set.add(
                        "%d-%s" % (cur_pos - seq_left, "-".join(part)) + tail)
        if i_found:
            if not found:
                cmp_left = i + 1
                left_alt_set.add(cur_ht_str)
            found = True
    if not found:
        left_alt_set.add(str(left))

    # ---- right end ---- #
    found = False
    for i in range(len(cmp_list)):
        i_found = False
        typ, cur_left, length = cmp_list[i][:3]
        vid = cmp_list[i][3] if typ in ("mismatch", "deletion") else ""
        if typ in ("mismatch", "deletion", "insertion") \
                and not str(vid).startswith("hv"):
            continue
        cur_right = cur_left + length - 1 if typ in ("match", "deletion") \
            else cur_left
        cur_ht, cur_seq = ht_and_seq(cmp_list[i:])
        cur_ht_str = str(right) if not cur_ht \
            else "%s-%d" % ("-".join(cur_ht), right)
        ht_i = _lower_bound(alts_right_list, cur_left)
        for ht_j in range(ht_i, len(alts_right_list)):
            ht_pos, ht = alts_right_list[ht_j]
            if ht_pos > cur_right:
                break
            if ht_pos < cur_left:
                continue
            if cur_ht and ht.find("-".join(cur_ht)) == -1:
                continue
            parts = ht.split("-")[1:]
            if len(cur_ht) + 1 == len(parts):
                if right > int(parts[-1]):
                    continue
            else:
                vid2 = parts[len(cur_ht)]
                _vt2, vp2, _ = Vars[vid2]
                if right >= vp2:
                    continue
            i_found = True
            rep_ht = alts_right_list[ht_j][1]
            for alt_ht_str in alts_right[rep_ht]:
                alt = alt_ht_str.split("-")
                alt_left = int(alt[0])
                assert cur_left <= alt_left
                seq_pos = alt_left - cur_left
                cur_pos = alt_left
                part = []
                for vid_ in alt[1:-1]:
                    vt_, vp_, vd_ = Vars[vid_]
                    assert vp_ >= cur_pos
                    nsp = seq_pos + (vp_ - cur_pos)
                    if nsp >= len(cur_seq):
                        break
                    if vt_ == "single":
                        nsp += 1
                        ncp = vp_ + 1
                    else:
                        ncp = vp_ + int(vd_)
                    part.append(vid_)
                    if nsp >= len(cur_seq):
                        break
                    seq_pos, cur_pos = nsp, ncp
                if part:
                    seq_left = len(cur_seq) - seq_pos - 1
                    assert seq_left >= 0
                    head = ""
                    if found:
                        mids = [c[3] for c in cmp_list[cmp_right + 1:i]
                                if c[0] in ("mismatch", "deletion",
                                            "insertion")
                                and str(c[3]).startswith("hv")]
                        if mids:
                            head = "-".join(mids) + "-"
                    right_alt_set.add(
                        head + "%s-%d" % ("-".join(part), cur_pos + seq_left))
        if i_found:
            if not found:
                cmp_right = i - 1
                right_alt_set.add(cur_ht_str)
            found = True
    if not found:
        right_alt_set.add(str(right))

    if cmp_right < cmp_left:
        cmp_left = 0
        left_alt_set = {str(left)}

    from ..validate import SANITY_CHECK, check_amb_uniqueness
    if SANITY_CHECK:
        check_amb_uniqueness(cmp_list, cmp_left, cmp_right,
                             list(left_alt_set), list(right_alt_set))

    return cmp_left, cmp_right, list(left_alt_set), list(right_alt_set)
