"""The hierarchical EM staging policy exists exactly once
(hgtpu/typer/staging.py) and both the host engine and the sharded
device program consume it (VERDICT r3 item 6)."""
import numpy as np

from hgtpu.typer.staging import (EXPANSION_MIN_PROB, EXPANSION_TOP_RANK,
                                 expansion_winners)


def test_expansion_rule_constants():
    # the reference's cutoffs (typing_core.py:1750-1752)
    assert EXPANSION_TOP_RANK == 10
    assert EXPANSION_MIN_PROB == 0.03


def test_expansion_winners_rule():
    groups = {0: [0, 5, 6], 1: [1], 2: [2, 7], 3: [3, 8], 4: [4, 9]}
    # rank 0: multi-member -> expands; rank 1: singleton -> skipped but
    # does NOT stop the scan; rank 2: multi-member at p>=3% -> expands;
    # rank 3 (index 3) is past rank 10? no — cutoff fires only at
    # rank>=10 AND p<3%.
    ranked = [(0, 0.5), (1, 0.3), (2, 0.1), (3, 0.02)]
    sel, psum = expansion_winners(ranked, groups)
    assert sel == {0, 5, 6, 2, 7, 3, 8}
    assert abs(psum - (0.5 + 0.1 + 0.02)) < 1e-12


def test_expansion_cutoff_at_rank_10():
    groups = {i: [i, 100 + i] for i in range(20)}
    ranked = [(i, 0.5 if i < 2 else 0.01) for i in range(20)]
    sel, psum = expansion_winners(ranked, groups)
    # ranks 0-9 scanned (low prob alone does not stop before rank 10);
    # rank 10 at p<3% stops the scan
    assert sel == {i for i in range(10)} | {100 + i for i in range(10)}
    assert abs(psum - (2 * 0.5 + 8 * 0.01)) < 1e-12


def test_both_paths_share_the_policy():
    """The host engine and the sharded program must resolve the SAME
    function object — no second copy of the constants anywhere."""
    import inspect

    import hgtpu.parallel.e2e as e2e
    import hgtpu.typer.engine as engine
    import hgtpu.typer.staging as staging

    assert "expansion_winners" in inspect.getsource(e2e)
    assert "staged_abundance" in inspect.getsource(engine)
    # neither module re-states the numeric policy
    for mod in (e2e, engine):
        src = inspect.getsource(mod)
        assert "0.03" not in src, mod.__name__
        assert "prob_i >= 10" not in src, mod.__name__
    assert staging.expansion_winners is expansion_winners


def test_host_and_device_expansion_sets_equal():
    """Both call forms (host name-ranked list, device abundance vector)
    select identical expansion sets on a scale-shaped ranking."""
    rng = np.random.default_rng(7)
    A = 512
    prob_vec = np.zeros(A)
    hot = rng.choice(A, 15, replace=False)
    prob_vec[hot] = rng.dirichlet(np.ones(15))
    groups = {int(i): [int(i), int(i) + A] for i in hot[::2]}

    # device form: argsort over the dense vector, positives only
    order = np.argsort(-prob_vec, kind="stable")
    ranked_dev = [(int(i), float(prob_vec[i])) for i in order
                  if prob_vec[i] > 0.0]
    # host form: a name-ranked list (already positive-only, descending)
    ranked_host = sorted(((int(i), float(prob_vec[i])) for i in hot),
                         key=lambda t: -t[1])
    sel_d, ps_d = expansion_winners(ranked_dev, groups)
    sel_h, ps_h = expansion_winners(ranked_host, groups)
    assert sel_d == sel_h
    assert abs(ps_d - ps_h) < 1e-12
