"""Haplotype-window path constraint (ref --haplotype,
typing_common.py:995-1027): within a span covered by an observed
haplotype, the verifier may only combine catalog indels that co-occur in
some allele.  Host and native verifiers must agree bit-identically."""
import numpy as np
import pytest

from hgtpu.db.catalog import GeneRef, VT_SINGLE, VT_DELETION, VT_INSERTION
from hgtpu.align.verify import GeneVerifier, build_haplotype_constraint
from hgtpu.utils.dna import encode_seq


def _gene_two_indels():
    """Backbone with a deletion (allele B) and a nearby insertion
    (allele C) that never co-occur; one haplotype row covers the span."""
    bb = "ACGTACGTAGGCTTACGATCGGATCCGTACGTTAGCATCGATCGGTACCGTA" * 2
    links = np.zeros((2, 3), dtype=bool)
    links[0, 1] = True   # del carried by allele B only
    links[1, 2] = True   # ins carried by allele C only
    return GeneRef(
        gene="X", backbone_name="X*BB", backbone=bb,
        allele_names=["X*A", "X*B", "X*C"],
        var_ids=["hv0", "hv1"],
        var_type=np.array([VT_DELETION, VT_INSERTION], np.int8),
        var_pos=np.array([20, 34], np.int32),
        var_len=np.array([2, 2], np.int32),
        var_data=["2", "TT"],
        var_freq=np.array([10.0, 10.0], np.float32),
        links=links,
        exons=[(0, len(bb) - 1)], primary_exons=[(0, len(bb) - 1)],
        haplotypes=[(18, 40, [0]), (18, 40, [1])],
    )


def _read_with_both(gene):
    """A recombinant read using BOTH indels (never observed together)."""
    bb = gene.backbone
    # start at 10: matches, then deletion of bb[20:22], then insertion TT
    # before bb[34], then matches out to 60
    seq = bb[10:20] + bb[22:34] + "TT" + bb[34:60]
    return encode_seq(seq), 10


def test_constraint_tables():
    gene = _gene_two_indels()
    disallowed, cover_right = build_haplotype_constraint(gene)
    assert (0, 1) in disallowed and (1, 0) in disallowed
    assert cover_right[0] == 40


def test_recombinant_spelling_rejected():
    gene = _gene_two_indels()
    codes, start = _read_with_both(gene)

    free = GeneVerifier(gene, max_novel=2, haplotype_paths=False)
    res_free = free.verify(codes, start)
    assert res_free is not None and res_free[0] == 0, res_free
    used = {e[3] for e in res_free[1]}
    assert used == {0, 1}  # unconstrained spelling uses both catalog indels

    con = GeneVerifier(gene, max_novel=2, haplotype_paths=True)
    res_con = con.verify(codes, start)
    if res_con is not None:
        cost, ops = res_con
        assert cost > 0 or {e[3] for e in ops} != {0, 1}


def test_single_indel_reads_unaffected():
    gene = _gene_two_indels()
    bb = gene.backbone
    for seq, start in [
        (bb[10:20] + bb[22:60], 10),            # deletion only
        (bb[10:34] + "TT" + bb[34:60], 10),     # insertion only
        (bb[10:60], 10),                        # plain
    ]:
        codes = encode_seq(seq)
        free = GeneVerifier(gene, max_novel=2, haplotype_paths=False)
        con = GeneVerifier(gene, max_novel=2, haplotype_paths=True)
        assert free.verify(codes, start) == con.verify(codes, start)


def test_native_matches_host_with_constraint():
    from hgtpu.align.native_verify import NativeVerifier, native_available
    if not native_available():
        pytest.skip("native library not built")
    gene = _gene_two_indels()
    bb = gene.backbone
    reads, starts = [], []
    both = _read_with_both(gene)
    reads.append(both[0]); starts.append(both[1])
    for seq, start in [
        (bb[10:20] + bb[22:60], 10),
        (bb[10:34] + "TT" + bb[34:60], 10),
        (bb[10:60], 10),
        (bb[5:20] + bb[22:34] + "TT" + bb[34:45], 5),
    ]:
        reads.append(encode_seq(seq)); starts.append(start)
    host = GeneVerifier(gene, max_novel=2, haplotype_paths=True)
    nat = NativeVerifier(gene, max_novel=2, haplotype_paths=True)
    cost, ops = nat.verify_flat(reads, starts)
    for i, (r, s) in enumerate(zip(reads, starts)):
        h = host.verify(r, s)
        if h is None:
            assert cost[i] < 0, i
        else:
            assert cost[i] == h[0], i
            assert ops[i] == h[1], i
