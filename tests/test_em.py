"""EM solver tests: the jitted dense device EM and the shipped
vectorized solver must agree with the reference-literal dict oracle
(tests/reference_em.py; component #11)."""
import numpy as np

from hgtpu.typer.em import em_solve_dense, single_abundance


def _random_classes(rng, A=40, C=25):
    M = rng.random((C, A)) < 0.15
    M[:, rng.integers(0, A)] = True  # ensure nonempty
    counts = rng.integers(1, 80, C).astype(np.float64)
    names = ["X*%02d" % i for i in range(A)]
    cmpt = {}
    for c in range(C):
        key = "-".join(names[a] for a in np.flatnonzero(M[c]))
        cmpt[key] = cmpt.get(key, 0) + float(counts[c])
    return M, counts, names, cmpt


def test_dense_matches_dict_em():
    rng = np.random.default_rng(5)
    M, counts, names, cmpt = _random_classes(rng)
    ref = dict((a, p) for a, p in single_abundance(cmpt))
    dense = em_solve_dense(M, counts)
    for i, name in enumerate(names):
        assert abs(dense[i] - ref.get(name, 0.0)) < 5e-3, name


def test_dense_with_lengths():
    rng = np.random.default_rng(7)
    M, counts, names, cmpt = _random_classes(rng)
    lengths = rng.integers(800, 1200, len(names)).astype(np.float64)
    ldict = {n: float(l) for n, l in zip(names, lengths)}
    ref = dict((a, p) for a, p in single_abundance(cmpt, lengths=ldict))
    dense = em_solve_dense(M, counts, lengths)
    for i, name in enumerate(names):
        assert abs(dense[i] - ref.get(name, 0.0)) < 5e-3, name


def test_single_class():
    assert single_abundance({"X*01": 10}) == [["X*01", 1.0]]


def test_np_matches_dict_em():
    """The vectorized float64 path must track the reference-literal dict
    EM to float-reorder precision, with and without pruning/lengths."""
    from hgtpu.typer.em import _single_abundance_np

    rng = np.random.default_rng(11)
    for trial in range(6):
        M, counts, names, cmpt = _random_classes(rng, A=60, C=40)
        lengths = rng.integers(800, 1200, len(names)).astype(np.float64)
        ldict = {n: float(l) for n, l in zip(names, lengths)}
        for remove_low, ld in ((False, None), (True, None), (True, ldict)):
            from tests.reference_em import single_abundance_dict
            ref = dict((a, p) for a, p in single_abundance_dict(
                cmpt, remove_low, ld))
            fast = dict((a, p) for a, p in _single_abundance_np(
                cmpt, remove_low, ld or {}))
            for name in names:
                assert abs(fast.get(name, 0.0) - ref.get(name, 0.0)) \
                    < 1e-6, (trial, remove_low, bool(ld), name)
