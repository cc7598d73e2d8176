"""Dev-only: sub-op profile of the typing stats fold at HLA scale.

Not a test — run by hand to guide device-offload decisions (VERDICT r1
item 3).  Usage: python devel/profile_scale.py [n_alleles]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main():
    from synth import make_hla_scale_msa
    from hgtpu.db import build_gene_ref
    from hgtpu.align import GeneAligner
    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads
    from hgtpu.utils.trace import TRACE

    n_alleles = int(sys.argv[1]) if len(sys.argv) > 1 else 3600
    spec = make_hla_scale_msa(n_alleles=n_alleles)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    aligner = GeneAligner(ref)
    truth = ref.allele_names[123]
    r1, r2, _ = simulate_reads(ref, [truth], simulate_interval=2, seed=1)
    reads_1 = [(r.name, r.seq) for r in r1]
    reads_2 = [(r.name, r.seq) for r in r2]

    # instrument the engine's stats fold sub-ops via monkeypatch
    import hgtpu.typer.engine as E
    import hgtpu.typer.counting as C

    orig_batch = C.StatAccumulator.add_reads_batch

    def timed_batch(self, counts_mat, weights):
        t0 = time.perf_counter()
        out = orig_batch(self, counts_mat, weights)
        TRACE.add("stats.add_reads_batch", time.perf_counter() - t0)
        return out

    C.StatAccumulator.add_reads_batch = timed_batch

    orig_reduceat = np.add.reduceat

    for rep in range(3):
        TRACE.reset()
        t0 = time.time()
        res = type_reads(ref, reads_1, reads_2, aligner=aligner)
        dt = time.time() - t0
        print("rep %d: %.2fs  %d reads/s  top=%s" %
              (rep, dt, int((len(reads_1) + len(reads_2)) / dt),
               res.prob[0][0]))
    TRACE.report()


if __name__ == "__main__":
    main()
