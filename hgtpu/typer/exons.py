"""Exon projection of read haplotypes.

Faithful port of get_exon_haplotypes (typing_core.py:718-792): clip a
haplotype's span to each overlapping exon, splitting at variant
boundaries with the reference's exact deletion-edge rules.
"""
from __future__ import annotations


def get_exon_haplotypes(ht, exons):
    """ht: (left, right, [HtOp]) -> list of clipped (left, right, [HtOp])."""
    if not exons:
        return []
    ht_left0, ht_right0, ops0 = ht
    out = []
    for e_left, e_right in exons:
        ht_left, ht_right = ht_left0, ht_right0
        ops = list(ops0)
        if e_left > ht_right or e_right < ht_left:
            continue
        if ht_left < e_left:
            split = False
            for i in range(len(ops)):
                op = ops[i]
                if (op.kind != "deletion" and op.pos >= e_left) \
                        or (op.kind == "deletion" and op.pos - 1 >= e_left):
                    ht_left = e_left
                    ops = ops[i:]
                    split = True
                    break
                if op.kind == "deletion":
                    right = op.pos + op.length  # ref: left + int(data)
                    if right >= e_left:
                        ht_left = right
                        ops = ops[i + 1:]
                        split = True
                        break
            if not split:
                ht_left = e_left
                ops = []
        if ht_right > e_right:
            split = False
            for i in reversed(range(len(ops))):
                op = ops[i]
                right = op.pos
                if op.kind == "deletion":
                    right = right + op.length - 1
                if (op.kind != "deletion" and right <= e_right) \
                        or (op.kind == "deletion" and right + 1 <= e_right):
                    ht_right = e_right
                    ops = ops[: i + 1]
                    split = True
                    break
                if op.kind == "deletion":
                    left = right - op.length
                    if left <= e_right:
                        ht_right = left
                        ops = ops[:i]
                        split = True
                        break
            if not split:
                ht_right = e_right
                ops = []
        if ht_left <= ht_right:
            out.append((ht_left, ht_right, ops))
    return out
