"""Randomized closed-loop regression campaign.

Broader than the pytest suite: sweeps gene shapes (allele counts, panel
sizes, indel densities), read regimes (errors, single-end, heterozygous
pairs), and min_var_freq settings, asserting the reference's golden
invariant — every true allele ranks inside the drawn set with the #1
call at >= 99.99% abundance for single draws.  The reference's analog is
the `--debug basic` self-test loop (typing_core.py:2488-2648) run across
its database families.

Usage: python devel/campaign.py [--quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from synth import make_gene_msa  # noqa: E402

from hgtpu.db import build_gene_ref  # noqa: E402
from hgtpu.pipeline import simulation_sweep  # noqa: E402
from hgtpu.typer.engine import TypingOptions  # noqa: E402


def configs(quick):
    # (name, msa kwargs, build kwargs, sweep kwargs)
    base = [
        ("hla-default", dict(seed=11), dict(min_var_freq=0.0),
         dict(test_size=4, seed=101, simulate_interval=5)),
        ("hla-errors", dict(seed=12), dict(min_var_freq=0.0),
         dict(test_size=3, seed=5, simulate_interval=5,
              perbase_errorrate=2.0)),
        ("hla-hetero", dict(seed=13), dict(min_var_freq=0.0),
         dict(test_size=3, seed=7, allele_count=2, simulate_interval=5)),
        ("hla-single-end", dict(seed=14), dict(min_var_freq=0.0),
         dict(test_size=3, seed=9, paired=False, simulate_interval=5)),
        ("insertion-gene", dict(seed=15, n_ins=14), dict(min_var_freq=8.0),
         dict(test_size=3, seed=11, simulate_interval=5)),
        ("indel-dense", dict(seed=16, n_del=24, n_ins=12),
         dict(min_var_freq=0.0),
         dict(test_size=3, seed=13, simulate_interval=5)),
        ("small-panel", dict(seed=17, n_alleles=8, length=1200),
         dict(min_var_freq=0.0),
         dict(test_size=3, seed=15, simulate_interval=3)),
    ]
    if not quick:
        base += [
            ("large-panel", dict(seed=18, n_alleles=120, length=3000),
             dict(min_var_freq=0.0),
             dict(test_size=3, seed=17, simulate_interval=7)),
            ("long-reads", dict(seed=19), dict(min_var_freq=0.0),
             dict(test_size=2, seed=19, read_len=150, fragment_len=400,
                  simulate_interval=5)),
            ("hetero-errors", dict(seed=20), dict(min_var_freq=0.0),
             dict(test_size=2, seed=21, allele_count=2,
                  perbase_errorrate=1.0, simulate_interval=5)),
        ]
    return base


def main():
    quick = "--quick" in sys.argv
    total = passed = 0
    t0 = time.time()
    for name, msa_kw, build_kw, sweep_kw in configs(quick):
        spec = make_gene_msa(**msa_kw)
        ref, _ = build_gene_ref(
            "A", spec["names"], spec["rows"], spec["ref_allele"],
            exons_ref_coords=spec["exons"],
            primary_exon_idx=spec["primary_exon_idx"], **build_kw)
        opts = TypingOptions(simulation=True,
                             allow_discordant=not sweep_kw.get("paired",
                                                               True))
        n, results = simulation_sweep(ref, opts=opts, **sweep_kw)
        want = len(results) * sweep_kw.get("allele_count", 1)
        ok = n == want
        # single draws must hit the golden 100.00% abundance invariant;
        # configs that exclude variants by frequency (min_var_freq > 0)
        # legitimately leak a little mass to near-identical alleles, as
        # the reference does when reads carry out-of-catalog variants
        if ok and sweep_kw.get("allele_count", 1) == 1 \
                and not sweep_kw.get("perbase_errorrate"):
            floor = 0.99 if build_kw.get("min_var_freq") else 0.9999
            ok = all(res.prob[0][1] >= floor for _, res in results)
        total += want
        passed += n if ok else 0
        print("%-16s %d/%d %s" % (name, n, want, "OK" if ok else "FAIL"))
        if not ok:
            for alleles, res in results:
                print("   true=%s top=%s" % (alleles, res.prob[:2]))
    dt = time.time() - t0
    print("campaign: %d/%d passed in %.0fs" % (passed, total, dt))
    sys.exit(0 if passed == total else 1)


if __name__ == "__main__":
    main()
