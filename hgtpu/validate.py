"""Opt-in runtime sanity checks.

Equivalent of hisatgenotype_validation_check.py (368 LoC), gated the same
way the reference gates via devel/settings.json -> sanity_check
(typing_core.py:36-42): set HGTPU_SANITY_CHECK=1 or edit
devel/settings.json to enable assertions inside the hot paths.
"""
from __future__ import annotations

import json
import os

import numpy as np


def sanity_enabled() -> bool:
    if os.environ.get("HGTPU_SANITY_CHECK"):
        return os.environ["HGTPU_SANITY_CHECK"] not in ("0", "false", "")
    settings = os.path.join(os.path.dirname(__file__), "..", "devel",
                            "settings.json")
    try:
        with open(settings) as f:
            return bool(json.load(f).get("sanity_check", False))
    except OSError:
        return False


SANITY_CHECK = sanity_enabled()


def validate_variants_sorted(gene):
    """Variant table must be key_varKey-sorted (ref: validate_variants)."""
    assert np.all(np.diff(gene.var_pos) >= 0), "variants out of order"


def validate_constructs(gene, msa_rows=None, names=None):
    """Sequence reconstruction round trip (ref: validate_constructs:157):
    backbone + variants must rebuild every allele sequence."""
    if msa_rows is None:
        # internal consistency: reconstruction must at least be acyclic and
        # non-empty per allele
        for name in gene.allele_names:
            seq = gene.allele_seq(name)
            assert len(seq) > 0, name
        return
    for name in gene.allele_names:
        i = names.index(name)
        stripped = msa_rows[i].replace(".", "").replace("~", "")
        assert gene.allele_seq(name) == stripped, \
            "reconstruction mismatch for %s" % name


def validate_haplotypes(gene):
    """Haplotype windows sorted and covering freq-passing variants
    (ref: validate_haplotype:29)."""
    prev = (-1, -1)
    covered = set()
    for left, right, vidxs in gene.haplotypes:
        assert left <= right
        for v in vidxs:
            covered.add(v)
    passing = {i for i in range(gene.n_vars)
               if gene.var_freq[i] >= gene.min_var_freq}
    assert passing <= covered, "haplotypes miss variants"


def check_amb_uniqueness(cmp_list, cmp_left, cmp_right, left_alts,
                         right_alts):
    """Alt end spellings must be unique (ref: check_amb_uniqueness:313)."""
    assert len(set(left_alts)) == len(left_alts)
    assert len(set(right_alts)) == len(right_alts)
    assert 0 <= cmp_left <= len(cmp_list)
    assert cmp_right < len(cmp_list)


def check_allele_validity(gene, seqs_by_name):
    """Allele dictionary equality vs the sequences file
    (ref: check_allele_validity:357)."""
    for name, seq in seqs_by_name.items():
        assert gene.allele_seq(name) == seq, name


def validate_exons(gene):
    """Exons must be within the backbone and primaries a subset
    (ref: validate_exons:234)."""
    for l, r in gene.exons:
        assert 0 <= l <= r < len(gene.backbone)
    assert {tuple(e) for e in gene.primary_exons} \
        <= {tuple(e) for e in gene.exons}


def validate_gene(gene, msa_rows=None, names=None):
    """Run the full suite on one GeneRef."""
    validate_variants_sorted(gene)
    validate_constructs(gene, msa_rows, names)
    validate_haplotypes(gene)
    validate_exons(gene)
