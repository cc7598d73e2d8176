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

    @property
    def mapped(self) -> bool:
        return self.pos >= 0
