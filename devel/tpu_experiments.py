"""One-chip TPU experiments: kernel-choice profiling for the round notes.

Run on a TPU-attached host (axon tunnel ok).  Three experiments:

1. placement-pallas: validate ops/placement_pallas.py on hardware by
   comparing its scores against the XLA matmul path on the HOST (the
   round-2 attempt compared on device and hung the tunnel runtime), and
   time both.
2. fold-pallas: DeviceCounter(use_pallas=True/False) A/B on an
   IMGT-scale compat batch — is the hand-tiled bitset AND-reduce faster
   than XLA's gather+reduce on real silicon?
3. toy-device-fold: device_counting="on" vs "auto(host)" on the
   60-allele toy gene — does the fused fold win below DEVICE_FOLD_MIN_A
   despite the tunnel round trip?

Prints one line per experiment; exit code 0 even when a kernel loses —
the point is the measurement.
"""
import sys
import time

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def exp_placement_pallas():
    import numpy as np

    from hgtpu.ops import placement as P

    rng = np.random.default_rng(0)
    reads = rng.integers(0, 4, size=(1024, 128), dtype=np.int8)
    bb = rng.integers(0, 4, size=3500, dtype=np.int8)
    pwm = np.zeros((3500, 5), np.float32)
    pwm[np.arange(3500), bb] = 1.0
    m = reads.shape[1]
    pwm_ext = np.concatenate(
        [np.zeros((m, 5), np.float32), pwm, np.zeros((m, 5), np.float32)])

    import jax
    import jax.numpy as jnp
    pe = jnp.asarray(pwm_ext)
    rd = jnp.asarray(reads)

    xla_fn = jax.jit(P.correlate_scores)
    s_x = xla_fn(pe, rd)
    s_xh = np.asarray(s_x)                           # host-side compare
    t0 = time.perf_counter()
    for _ in range(5):
        s_x = xla_fn(pe, rd)
    jax.block_until_ready(s_x)
    t_xla = (time.perf_counter() - t0) / 5

    try:
        from hgtpu.ops.placement_pallas import correlate_scores_pallas
        pal_fn = jax.jit(correlate_scores_pallas)
        s_p = pal_fn(pe, rd)
        s_ph = np.asarray(s_p)
        ok = bool(np.allclose(s_xh, s_ph, atol=0.5))  # bf16 accum slack
        max_err = float(np.abs(s_xh - s_ph).max())
        t0 = time.perf_counter()
        for _ in range(5):
            s_p = pal_fn(pe, rd)
        jax.block_until_ready(s_p)
        t_pal = (time.perf_counter() - t0) / 5
        print("[placement-pallas] match=%s max_err=%.3g xla=%.1fms "
              "pallas=%.1fms" % (ok, max_err, 1e3 * t_xla, 1e3 * t_pal))
    except Exception as e:  # pragma: no cover - hardware probe
        print("[placement-pallas] FAILED: %r" % (e,))


def exp_fold_pallas():
    import numpy as np

    from synth import make_hla_scale_msa

    from hgtpu.db import build_gene_ref
    from hgtpu.typer.device_count import DeviceCounter

    spec = make_hla_scale_msa(n_alleles=3600, length=3500)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    rng = np.random.default_rng(1)
    # synthetic sub-ht batch shaped like the depth run: ~8k hts, <=8 vars
    H = 8192
    sub = []
    for _ in range(H):
        k = int(rng.integers(1, 6))
        vs = sorted(rng.integers(0, ref.n_vars, size=k).tolist())
        lo = int(ref.var_pos[vs[0]])
        hi = int(max(ref.var_pos[v] for v in vs)) + 1
        sub.append((lo, hi, vs))
    outs = {}
    for use_pallas in (False, True):
        try:
            dc = DeviceCounter(ref, use_pallas=use_pallas)
            lefts, rights, vars_ = dc.pack_hts(sub)
            r = dc.compat_masks(lefts, rights, vars_)   # warms + fetches
            t0 = time.perf_counter()
            for _ in range(3):
                r = dc.compat_masks(lefts, rights, vars_)
            dt = (time.perf_counter() - t0) / 3
            outs[use_pallas] = (r, dt)
        except Exception as e:  # pragma: no cover
            print("[fold-pallas] use_pallas=%s FAILED: %r" % (use_pallas, e))
            return
    same = bool((outs[False][0] == outs[True][0]).all())
    print("[fold-pallas] match=%s xla=%.1fms pallas=%.1fms"
          % (same, 1e3 * outs[False][1], 1e3 * outs[True][1]))


def exp_toy_device_fold():
    from synth import make_gene_msa

    from hgtpu.align import GeneAligner
    from hgtpu.db import build_gene_ref
    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads
    from hgtpu.typer.engine import TypingOptions

    spec = make_gene_msa(seed=11, n_alleles=60, length=3000)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    alleles = ref.allele_names[:4]
    r1, r2, _ = simulate_reads(ref, alleles, simulate_interval=1)
    reads_1 = [(r.name, r.seq) for r in r1]
    reads_2 = [(r.name, r.seq) for r in r2]
    al = GeneAligner(ref)
    for mode in ("auto", "on"):
        opts = TypingOptions(simulation=True, device_counting=mode)
        type_reads(ref, reads_1, reads_2, opts, aligner=al)   # warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            type_reads(ref, reads_1, reads_2, opts, aligner=al)
            best = min(best, time.perf_counter() - t0)
        n = len(reads_1) + len(reads_2)
        print("[toy-device-fold] mode=%s dt=%.3fs reads/s=%.0f"
              % (mode, best, n / best))


if __name__ == "__main__":
    import jax
    print("[tpu-exp] backend:", jax.default_backend())
    for fn in (exp_placement_pallas, exp_fold_pallas, exp_toy_device_fold):
        try:
            fn()
        except Exception as e:
            print("[tpu-exp] %s crashed: %r" % (fn.__name__, e))
