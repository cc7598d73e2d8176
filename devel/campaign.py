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


def codis_config():
    """STR (CODIS) closed loop: every repeat-count allele must be the
    top call under leftmost/enable-codis alignment semantics."""
    import random

    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads
    from hgtpu.tools.codis import codis_msa

    rng = random.Random(5)
    f5 = "".join(rng.choice("ACGT") for _ in range(400))
    f3 = "".join(rng.choice("ACGT") for _ in range(400))
    table = [("D18S51*%d" % c, "[AGAA]%d" % c) for c in (9, 10, 12, 13, 16)]
    table.append(("D18S51*14.2", "[AGAA]13 GA [AGAA]1"))
    names, rows = codis_msa(table, f5, f3)
    ref, _ = build_gene_ref("D18S51", names, rows, names[0],
                            min_var_freq=0.0, collapse=False,
                            leftshift=False)
    n = 0
    for allele in ("D18S51*10", "D18S51*13", "D18S51*14.2", "D18S51*16"):
        r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=3,
                                   frag_len=300)
        res = type_reads(ref, [(r.name, r.seq) for r in r1],
                         [(r.name, r.seq) for r in r2],
                         TypingOptions(family="codis", simulation=True))
        ok = res.prob[0][0] == allele
        n += ok
        if not ok:
            print("   codis true=%s top=%s" % (allele, res.prob[:3]))
    return n, 4


def family_config():
    """Multi-gene family routing: reads from two genes typed jointly."""
    from hgtpu.pipeline import type_family
    from hgtpu.sim import simulate_reads
    from synth import make_family

    from hgtpu.db import build_catalog_from_msa

    fam = make_family(genes=("A", "B"), n_alleles=16, length=1600, seed=21)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=sp["names"], rows=sp["rows"],
                 ref_allele=sp["ref_allele"], exons=sp["exons"],
                 primary_exon_idx=sp["primary_exon_idx"])
         for g, sp in fam["specs"].items()},
        min_var_freq=0.0)
    n = want = 0
    for g in ("A", "B"):
        ref = cat.genes[g]
        true = ref.allele_names[3]
        r1, r2, _ = simulate_reads(ref, [true], simulate_interval=4)
        res = type_family(cat, [(r.name, r.seq) for r in r1],
                          [(r.name, r.seq) for r in r2], locus_list=[g],
                          opts=TypingOptions(simulation=True))[g]
        want += 1
        ok = res.prob and res.prob[0][0] == true
        n += bool(ok)
        if not ok:
            print("   family gene=%s true=%s top=%s"
                  % (g, true, res.prob[:2]))
    return n, want


def hla_scale_config():
    """Reference-scale closed loop: IMGT-HLA-A-magnitude panel (3,600
    alleles, ~1,500 variants, 3.5 kb) — truth must rank #1 at 100.00%."""
    from synth import make_hla_scale_msa

    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads

    spec = make_hla_scale_msa()
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    n = want = 0
    for idx, seed in ((55, 1), (1234, 2), (3333, 3)):
        allele = ref.allele_names[idx]
        r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=10,
                                   seed=seed)
        res = type_reads(ref, [(r.name, r.seq) for r in r1],
                         [(r.name, r.seq) for r in r2],
                         TypingOptions(simulation=True))
        want += 1
        ok = bool(res.prob) and res.prob[0][0] == allele \
            and res.prob[0][1] >= 0.9999
        n += bool(ok)
        if not ok:
            print("   hla-scale true=%s top=%s" % (allele, res.prob[:2]))
    # assembly (de Bruijn + Viterbi phasing) at full panel width — the
    # hg_test3 analog against the IMGT-magnitude DB
    allele = ref.allele_names[123]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=4, seed=1)
    res = type_reads(ref, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2],
                     TypingOptions(simulation=True, assembly=True))
    want += 1
    ok = (res.assembly_call is not None
          and res.assembly_call[0] == [allele, allele])
    n += bool(ok)
    if not ok:
        print("   hla-scale-assembly true=%s call=%s"
              % (allele, res.assembly_call))
    return n, want


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
    extra = [("codis-str", codis_config), ("family-2gene", family_config)]
    if not quick:
        extra.append(("hla-scale-3600", hla_scale_config))
    for name, fn in extra:
        n, want = fn()
        total += want
        passed += n
        print("%-16s %d/%d %s" % (name, n, want,
                                  "OK" if n == want else "FAIL"))
    dt = time.time() - t0
    print("campaign: %d/%d passed in %.0fs" % (passed, total, dt))
    sys.exit(0 if passed == total else 1)


if __name__ == "__main__":
    main()
