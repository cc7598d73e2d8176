"""Scale-regime stage attribution (no cProfile distortion).

Runs the bench's 3,600-allele heterozygous-pair regime once-warm then
best-of-N, printing the full TRACE report so host/device wall is
attributed stage by stage.  Usage:

    python devel/measure_scale.py [--repeats 3] [--toy] [--cpu]
"""
import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _build
    from hgtpu.align import GeneAligner
    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads
    from hgtpu.utils.trace import TRACE

    if args.toy:
        ref = _build("A", 60, 3000)
        truths = ref.allele_names[:4]
        kw = {}
    else:
        ref = _build("A", 3600, 3500, scale=True)
        truths = [ref.allele_names[123], ref.allele_names[2047]]
        kw = {"seed": 1}
    aligner = GeneAligner(ref)
    r1, r2, _ = simulate_reads(ref, truths, simulate_interval=1, **kw)
    reads_1 = [(r.name, r.seq) for r in r1]
    reads_2 = [(r.name, r.seq) for r in r2]
    n = len(reads_1) + len(reads_2)
    print("[measure] %d reads, %d alleles, backend=%s"
          % (n, ref.n_alleles, jax.default_backend()), file=sys.stderr)

    res0 = type_reads(ref, reads_1, reads_2, aligner=aligner)  # warm-up
    best = None
    for _ in range(args.repeats):
        TRACE.reset()
        t0 = time.time()
        res = type_reads(ref, reads_1, reads_2, aligner=aligner)
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, TRACE.summary())
    dt, summ = best
    assert res.prob[0][0] == res0.prob[0][0]
    print("[measure] wall %.3f s  (%.1f reads/s)" % (dt, n / dt),
          file=sys.stderr)
    staged = sum(v["s"] for v in summ.values())
    # nested sub-stages (count_fold.exec/prep live inside .device) are
    # counted once by the top stage; drop them from the coverage sum
    nested = sum(summ[k]["s"] for k in summ
                 if k.startswith("type.count_fold.")
                 and k != "type.count_fold.device")
    print("[measure] staged %.3f s (%.1f%% of wall; nested %.3f)"
          % (staged, 100.0 * (staged - nested) / dt, nested),
          file=sys.stderr)
    width = max(len(k) for k in summ)
    for k, v in sorted(summ.items(), key=lambda kv: -kv[1]["s"]):
        print("[measure] %-*s %8.3f s %7d calls %5.1f%%"
              % (width, k, v["s"], v["n"], 100.0 * v["s"] / dt),
              file=sys.stderr)


if __name__ == "__main__":
    main()
