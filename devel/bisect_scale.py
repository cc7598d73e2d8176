"""Dev tool: bisect a device-vs-host exon_cmpt divergence on the scale
panel down to one read pair and dump both sides' views of it."""
import sys

sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from synth import make_hla_scale_msa  # noqa: E402
from hgtpu.db import build_gene_ref  # noqa: E402
from hgtpu.pipeline import type_reads  # noqa: E402
from hgtpu.typer.engine import TypingOptions, GeneTyper, NovelVars  # noqa: E402
from hgtpu.sim import simulate_reads  # noqa: E402


def main():
    spec = make_hla_scale_msa()
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    pair = [ref.allele_names[500], ref.allele_names[3100]]
    import os
    if os.environ.get('BENCH_TRUTHS'):
        pair = [ref.allele_names[123], ref.allele_names[2047]]
    r1, r2, _ = simulate_reads(ref, pair, simulate_interval=int(__import__('os').environ.get('BS_INT', 1)), seed=int(__import__('os').environ.get('BS_SEED', 1)))
    R1 = [(r.name, r.seq) for r in r1]
    R2 = [(r.name, r.seq) for r in r2]

    def differs(lo, hi):
        d = type_reads(ref, R1[lo:hi], R2[lo:hi],
                       TypingOptions(simulation=True, device_typing="on"))
        h = type_reads(ref, R1[lo:hi], R2[lo:hi],
                       TypingOptions(simulation=True, device_typing="off"))
        return d.exon_cmpt != h.exon_cmpt or d.cmpt != h.cmpt

    lo, hi = 0, len(R1)
    if not differs(lo, hi):
        print("no divergence")
        return
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if differs(lo, mid):
            hi = mid
        elif differs(mid, hi):
            lo = mid
        else:
            print("non-local divergence", lo, mid, hi)
            break
    print("offending pair", lo, hi)
    print("r1:", R1[lo][0])
    print("r2:", R2[lo][0])

    from hgtpu.align import GeneAligner
    al = GeneAligner(ref)
    groups = [(["p|L"], [R1[lo][1]], "L"), (["p|R"], [R2[lo][1]], "R")]
    alns = [a for batch in al.align_batches(groups) for a in batch if a]
    ty = GeneTyper(ref, TypingOptions(simulation=True))
    novel = NovelVars()
    for a in alns:
        hts = ty.read_hts(a, novel, None)
        print(a.mate, "pos", a.pos, "right", a.right, "nm", a.nm)
        print("  hts:", hts)
        print("  may_trim:", ty.may_trim(a.pos, a.right - 1))
        print("  alts:", a.alts)

    from hgtpu.parallel.production import (_shared_sharded_typer,
                                           default_mesh)
    st = _shared_sharded_typer(ref, TypingOptions(), default_mesh(), 100)
    for mate, seq in (("L", R1[lo][1]), ("R", R2[lo][1])):
        out = st._debug(*st._tables, st._pad(st.encode([seq])))
        cnt, passed, use_r, lefts, rights, nh = \
            [np.asarray(x)[0] for x in out]
        print("device", mate, "passed", passed, "span", lefts, rights,
              "needs_host(ungated)", nh)
    o = st.count_classes(st.encode([R1[lo][1]]), st.encode([R2[lo][1]]))
    print("production punted?", o["punt"])


if __name__ == "__main__":
    main()
