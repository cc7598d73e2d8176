"""cProfile the scale-bench typing path (host-side hot spots).

Usage: python devel/profile_scale.py [--cpu] [--sort tottime] [--top 40]

Replicates bench.py's 3,600-allele heterozygous-pair regime and prints
the top functions by tottime so host work (resolve loop, fast paths,
pileup, counting prep) can be attributed line-by-line.
"""
import argparse
import cProfile
import os
import pstats
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sort", default="tottime")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--toy", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _build
    from hgtpu.align import GeneAligner
    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads

    if args.toy:
        ref = _build("A", 60, 3000)
        truths = ref.allele_names[:4]
        seed = None
    else:
        ref = _build("A", 3600, 3500, scale=True)
        truths = [ref.allele_names[123], ref.allele_names[2047]]
        seed = 1
    aligner = GeneAligner(ref)
    kw = {} if seed is None else {"seed": seed}
    r1, r2, _ = simulate_reads(ref, truths, simulate_interval=1, **kw)
    reads_1 = [(r.name, r.seq) for r in r1]
    reads_2 = [(r.name, r.seq) for r in r2]
    print("[profile] %d reads, %d alleles, backend=%s"
          % (len(reads_1) + len(reads_2), ref.n_alleles,
             jax.default_backend()), file=sys.stderr)

    # warm-up (compiles)
    type_reads(ref, reads_1, reads_2, aligner=aligner)

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    type_reads(ref, reads_1, reads_2, aligner=aligner)
    pr.disable()
    dt = time.time() - t0
    print("[profile] measured wall %.3f s (%.1f reads/s)"
          % (dt, (len(reads_1) + len(reads_2)) / dt), file=sys.stderr)
    st = pstats.Stats(pr)
    st.sort_stats(args.sort).print_stats(args.top)


if __name__ == "__main__":
    main()
