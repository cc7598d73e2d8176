"""Benchmark: end-to-end typing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no throughput numbers (SURVEY.md §6).  The
baseline anchor is MEASURED on this host by devel/baseline_emu.py — a
faithful pure-Python emulator of the reference's typing hot loop
(typing_core.py:800-1543 SAM decode + add_count/add_stat set algebra +
SQUAREM EM) run on the very same synthetic reads; the committed numbers
live in BASELINE_MEASURED.json.  The emulator omits alignment, error
correction and alt trimming, so it is a LOWER bound on the reference's
cost (generous anchor).

What is measured is the PRODUCTION path (pipeline.type_reads): on a TPU
backend this routes through the sharded device program — placement,
pileup-gated spelling, compatibility counting and on-device class dedup
in one dispatch + one fetch — with the host engine rescuing the punt
mask (parallel/production.py), bit-identical to the host engine
(tests/test_production.py).

Headline metric: hla_scale_typing_reads_per_s — end-to-end reads/s on
the 3,600-allele / 3.5 kb panel (IMGT HLA-A magnitude).  vs_baseline
divides it by the emulator's measured scale throughput.  The toy-gene
(60-allele) e2e number is reported alongside with its own anchor.

Extra fields:
  stage_shares — per-stage share of the measured wall time (utils.trace).
  device_wall_share — fraction of wall spent dispatching / waiting on the
      device.
  mfu_pct — dispatched device FLOPs / wall / v5e bf16 peak.
  bandwidth_pct — estimated HBM bytes moved / wall / v5e HBM bandwidth:
      the roofline companion to mfu_pct (the counting chain is
      gather/bandwidth-bound, not FLOP-bound).
  extract_* — WGS-volume read extraction: the C++ fastx scanner parse
      rate on a 2M-read FASTQ and the genotype-genome block routing rate
      (pipeline/extract_genome.py; ref extract_reads,
      typing_process.py:1330-1784).
"""
import json
import os
import sys
import time

sys.path.insert(0, "tests")

V5E_BF16_PEAK = 197e12   # FLOP/s, one v5e chip
V5E_HBM_BW = 819e9       # bytes/s, one v5e chip

DEVICE_STAGES = ("place.dispatch", "place.fetch", "verify.device_dp",
                 "type.count_masks.device", "type.count_fold.device",
                 "device.place", "device.spell", "device.countB")

FLOP_COUNTERS = ("flops.placement", "flops.device_fold", "flops.device_dp",
                 "flops.device_classes")
BYTE_COUNTERS = ("bytes.device_classes",)


def _load_measured_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    with open(path) as f:
        return json.load(f)


def _note(msg):
    print("[bench] %s" % msg, file=sys.stderr, flush=True)


def _measure(ref, reads_1, reads_2, aligner, opts=None, repeats=None):
    """Best-of-N e2e typing wall time; returns (best_dt, res, stage
    summary + counters of the best run, all_dts).  The TPU tunnel adds
    +-40% dispatch-latency noise, so the fastest run is the honest
    hardware number; the median + spread ship in the JSON so one noisy
    run is visible instead of silently shipping low.
    HGTPU_BENCH_REPEATS overrides N (default 5)."""
    if repeats is None:
        repeats = int(os.environ.get("HGTPU_BENCH_REPEATS", "5"))
    from hgtpu.pipeline import type_reads
    from hgtpu.utils.trace import TRACE

    best = None
    dts = []
    for _ in range(repeats):
        TRACE.reset()
        t0 = time.time()
        res = type_reads(ref, reads_1, reads_2, opts, aligner=aligner)
        dt = time.time() - t0
        dts.append(dt)
        if best is None or dt < best[0]:
            best = (dt, res, TRACE.summary(), TRACE.counters())
    return best + (sorted(dts),)


def _build(name, n_alleles, length, scale=False):
    from synth import make_gene_msa, make_hla_scale_msa
    from hgtpu.db import build_gene_ref

    spec = make_hla_scale_msa(n_alleles=n_alleles, length=length) if scale \
        else make_gene_msa(seed=11, n_alleles=n_alleles, length=length)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    return ref


def _bench_extraction():
    """WGS-volume extraction: stream a 2M-read FASTQ through the C++
    fastx scanner, then route a block-partitioned slice through the
    genotype-genome extractor (the reference forks per sample and bins
    20-Mbp blocks, typing_process.py:1330-1784)."""
    import numpy as np
    from hgtpu.native import scan_fastx

    rng = np.random.default_rng(0)
    n_scan = 2_000_000
    L = 100
    # synthesize the FASTQ text fully vectorized: fixed-width record
    # matrix [n, rec_len] uint8, one tobytes at the end
    t_gen = time.time()
    lut = np.frombuffer(b"ACGT", np.uint8)
    rows = lut[rng.integers(0, 4, (n_scan, L)).astype(np.uint8)]
    digits = 7
    ids = np.arange(n_scan, dtype=np.int64)
    name_digits = np.stack(
        [(ids // 10 ** (digits - 1 - k)) % 10 for k in range(digits)],
        axis=1).astype(np.uint8) + ord("0")
    rec_len = 2 + digits + 1 + L + 1 + 2 + L + 1
    rec = np.empty((n_scan, rec_len), np.uint8)
    rec[:, 0] = ord("@")
    rec[:, 1] = ord("r")
    rec[:, 2:2 + digits] = name_digits
    at = 2 + digits
    rec[:, at] = ord("\n")
    rec[:, at + 1:at + 1 + L] = rows
    at += 1 + L
    rec[:, at] = ord("\n")
    rec[:, at + 1] = ord("+")
    rec[:, at + 2] = ord("\n")
    rec[:, at + 3:at + 3 + L] = ord("I")
    rec[:, at + 3 + L] = ord("\n")
    text = rec.tobytes()
    _note("extraction: %d reads, %.0f MB fastq (gen %.1fs)"
          % (n_scan, len(text) / 1e6, time.time() - t_gen))

    t0 = time.time()
    recs = scan_fastx(text)
    scan_dt = time.time() - t0
    assert len(recs) == n_scan, len(recs)
    scan_rps = n_scan / scan_dt

    # block routing: genome extractor over a synthetic family genome
    from synth import make_family
    from hgtpu.db.build import build_catalog_from_msa
    from hgtpu.db.genome import build_genotype_genome
    from hgtpu.pipeline.extract_genome import GenomeExtractor
    import tempfile

    fam = make_family(seed=17)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"],
                 primary_exon_idx=s["primary_exon_idx"])
         for g, s in fam["specs"].items()},
        min_var_freq=0.0)
    for g, (lo, hi) in fam["loci"].items():
        cat.genes[g].chrom = "chrS"
        cat.genes[g].chrom_left = lo
        cat.genes[g].chrom_right = hi
    out = os.path.join(tempfile.mkdtemp(), "gg")
    spliced, offsets = build_genotype_genome({"chrS": fam["genome"]},
                                             {"hla": cat}, out)
    ex = GenomeExtractor(spliced, offsets, {"hla": cat})
    genome = fam["genome"]
    n_route = 100_000
    pos = rng.integers(0, len(genome) - 260, n_route)
    starts = pos[:, None] + np.arange(L)[None, :]
    g_codes = np.frombuffer(genome.encode(), np.uint8)
    r1s = g_codes[starts]
    reads_1 = [("q%d" % i, r1s[i].tobytes().decode()) for i in range(n_route)]
    t0 = time.time()
    routed = ex.extract(reads_1, None)
    route_dt = time.time() - t0
    routed_n = sum(len(v[0]) for v in routed.values()) if routed else 0
    return scan_rps, n_route / route_dt, routed_n


def main():
    from hgtpu.align import GeneAligner
    from hgtpu.sim import simulate_reads

    import hgtpu
    hgtpu.enable_compilation_cache()
    import jax
    backend = jax.default_backend()
    _note("backend: %s" % backend)

    # ---- flagship: hg_test1-scale gene (60 alleles / 3 kb) ---- #
    _note("building 60-allele gene")
    ref = _build("A", 60, 3000)
    aligner = GeneAligner(ref)
    alleles = ref.allele_names[:4]
    r1, r2, _ = simulate_reads(ref, alleles, simulate_interval=1)
    reads_1 = [(r.name, r.seq) for r in r1]
    reads_2 = [(r.name, r.seq) for r in r2]
    n_reads = len(reads_1) + len(reads_2)

    _note("warm-up / compile")
    _measure(ref, reads_1, reads_2, aligner, repeats=1)
    _note("measuring (%d reads)" % n_reads)
    best_dt, res, stages, counters, toy_dts = _measure(ref, reads_1,
                                                       reads_2, aligner)
    assert res.prob, "typing produced no abundance"
    assert res.prob[0][0] in alleles, "typing called a wrong allele"
    reads_per_s = n_reads / best_dt

    # ---- reference scale: 3,600 alleles / 3.5 kb ---- #
    _note("building 3,600-allele panel (HLA-A magnitude)")
    big = _build("A", 3600, 3500, scale=True)
    big_aligner = GeneAligner(big)
    # production regime: a HETEROZYGOUS truth pair at full simulation
    # depth (~13k reads) — a real HLA run types thousands of reads per
    # locus from a diploid sample, and fixed per-run costs (compile-free
    # dispatch latency, the class-program round trip) amortize over
    # depth exactly as they would in production.  The emulator anchor is
    # measured on this same read set (devel/baseline_emu.py).
    truths = [big.allele_names[123], big.allele_names[2047]]
    b1, b2, _ = simulate_reads(big, truths, simulate_interval=1, seed=1)
    breads_1 = [(r.name, r.seq) for r in b1]
    breads_2 = [(r.name, r.seq) for r in b2]
    bn = len(breads_1) + len(breads_2)
    _note("warm-up / compile (scale)")
    _measure(big, breads_1, breads_2, big_aligner, repeats=1)
    _note("measuring (%d reads, %d alleles)" % (bn, big.n_alleles))
    big_dt, bres, big_stages, big_counters, big_dts = _measure(
        big, breads_1, breads_2, big_aligner)
    top2 = {name for name, _ in bres.prob[:2]}
    assert top2 == set(truths), "scale typing missed the het truth pair"
    assert all(0.3 <= frac <= 0.7 for _, frac in bres.prob[:2]), \
        "het abundance off the 50/50 mix"
    big_reads_per_s = bn / big_dt

    # ---- WGS-volume extraction ---- #
    _note("extraction benchmark")
    try:
        scan_rps, route_rps, routed_n = _bench_extraction()
        _note("fastx scan %.0f reads/s, routing %.0f reads/s (%d routed)"
              % (scan_rps, route_rps, routed_n))
    except Exception as e:  # keep the headline metric robust
        _note("extraction bench failed: %r" % e)
        scan_rps = route_rps = None

    # ---- derived diagnostics ---- #
    baseline = _load_measured_baseline()
    anchor_scale = baseline["scale"]["reads_per_s"]
    anchor_toy = baseline["toy"]["reads_per_s"]
    stage_shares = {k: round(v["s"] / best_dt, 4)
                    for k, v in sorted(stages.items(),
                                       key=lambda kv: -kv[1]["s"])}
    device_share = sum(stages[k]["s"] for k in DEVICE_STAGES
                       if k in stages) / best_dt
    mfu = sum(counters.get(k, 0.0) for k in FLOP_COUNTERS) \
        / best_dt / V5E_BF16_PEAK
    big_mfu = sum(big_counters.get(k, 0.0) for k in FLOP_COUNTERS) \
        / big_dt / V5E_BF16_PEAK
    bw = sum(counters.get(k, 0.0) for k in BYTE_COUNTERS) \
        / best_dt / V5E_HBM_BW
    big_bw = sum(big_counters.get(k, 0.0) for k in BYTE_COUNTERS) \
        / big_dt / V5E_HBM_BW
    big_device_share = sum(big_stages[k]["s"] for k in DEVICE_STAGES
                           if k in big_stages) / big_dt

    out = {
        "metric": "hla_scale_typing_reads_per_s",
        "value": round(big_reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(big_reads_per_s / anchor_scale, 3),
        "baseline_anchor": {
            "scale_reads_per_s": anchor_scale,
            "toy_reads_per_s": anchor_toy,
            "source": "BASELINE_MEASURED.json (devel/baseline_emu.py; "
                      "reference typing hot loop, alignment omitted — "
                      "lower bound on reference cost)"},
        "toy_e2e_reads_per_s": round(reads_per_s, 1),
        "vs_baseline_toy": round(reads_per_s / anchor_toy, 3),
        "production_path": "device" if backend == "tpu" else "host",
        "repeats": len(big_dts),
        "hla_scale_dt_best": round(big_dts[0], 3),
        "hla_scale_dt_median": round(big_dts[len(big_dts) // 2], 3),
        "hla_scale_spread_pct": round(
            100.0 * (big_dts[-1] - big_dts[0])
            / max(big_dts[len(big_dts) // 2], 1e-9), 1),
        "toy_dt_best": round(toy_dts[0], 3),
        "toy_dt_median": round(toy_dts[len(toy_dts) // 2], 3),
        "stage_shares": stage_shares,
        "hla_scale_stage_shares": {
            k: round(v["s"] / big_dt, 4)
            for k, v in sorted(big_stages.items(),
                               key=lambda kv: -kv[1]["s"])},
        "device_wall_share": round(device_share, 4),
        "hla_scale_device_wall_share": round(big_device_share, 4),
        "mfu_pct": round(100.0 * mfu, 4),
        "hla_scale_mfu_pct": round(100.0 * big_mfu, 4),
        "bandwidth_pct": round(100.0 * bw, 4),
        "hla_scale_bandwidth_pct": round(100.0 * big_bw, 4),
    }
    if scan_rps:
        out["extract_fastx_scan_reads_per_s"] = round(scan_rps, 1)
        out["extract_route_reads_per_s"] = round(route_rps, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
