"""Alignment result records.

A ReadAln carries exactly the information the reference extracts from the
SAM stream (CIGAR + MD + Zs decode, typing_core.py:899-1124) without the
SAM round trip: backbone placement plus a cmp list of
("match"|"mismatch"|"deletion"|"insertion", pos, length, var_index, data)
segments, where var_index is an index into GeneRef's variant table or -1
for an unknown/novel difference.
"""
from __future__ import annotations

import dataclasses
import itertools

# process-wide serial for unique aligned records: fan-out clones of one
# unique read share the uid, so hot dicts key on one int instead of
# hashing the (pos, seq) string pair per lookup.  NEVER id()-based
# (stale-id reuse after GC); a monotone counter cannot collide.
_UID = itertools.count()


def aln_key(aln):
    """Dict key identifying an alignment by content: the aligner's uid
    when stamped (pos/seq/nm/cmp are functions of it), else the
    (pos, seq) pair (SAM-parsed records)."""
    u = aln.uid
    return u if u >= 0 else (aln.pos, aln.seq)


@dataclasses.dataclass
class ReadAln:
    read_id: str
    mate: str               # 'L', 'R', or 'U'
    pos: int                # 0-based backbone start
    right: int              # 0-based backbone end (exclusive)
    cmp: list               # [(type, pos, length, var_idx, data)]
    nm: int                 # novel-edit distance (known variants are free)
    is_rc: bool
    seq: str                # read sequence oriented to the backbone
    qual: str = ""
    codes: object = None    # int8 np array of `seq` (cached encoding)
    alts: list = None       # equal-cost alternative spellings [ReadAln]
                            # (STR loci: periodic repeats make several
                            # starts exactly equivalent; all must count)
    catalog: object = None  # every non-match op is a catalog variant
                            # (None = not computed, e.g. SAM-parsed)
    has_indel: object = None  # cmp holds a deletion/insertion op
                              # (None = not computed)
    uid: int = -1           # unique-aligned-record serial (see aln_key)

    @property
    def mapped(self) -> bool:
        return self.pos >= 0
