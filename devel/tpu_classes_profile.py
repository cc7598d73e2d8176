"""Hardware profile of the production class program's pieces: which op
burns the 2.5 s?  Times (compile, warm) for: legacy count_pairs (no
pileup/gate/pack), the full classes_pairs, a standalone pileup
scatter-add, a standalone class-pack (hash sort + dedup), and a
standalone gate.  Run on the real TPU."""
import sys
import time

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return compile_s, best


def main():
    print("backend:", jax.default_backend(), flush=True)
    from synth import make_gene_msa
    from hgtpu.db import build_gene_ref
    from hgtpu.parallel.e2e import ShardedTyper
    from hgtpu.parallel.sharded import make_mesh
    from hgtpu.sim import simulate_reads

    spec = make_gene_msa(seed=11, n_alleles=60, length=3000)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    st = ShardedTyper(ref, make_mesh(1))
    r1, r2, _ = simulate_reads(ref, ref.allele_names[:4],
                               simulate_interval=1)
    c1 = st._pad(st.encode([r.seq for r in r1]), bucket=True)
    c2 = st._pad(st.encode([r.seq for r in r2]), bucket=True)
    d1, d2 = jnp.asarray(c1), jnp.asarray(c2)
    n = c1.shape[0]
    print("pairs (padded):", n, flush=True)

    cs, ws = timeit(lambda a, b: st._count_pairs(*st._tables, a, b), d1, d2)
    print("legacy count_pairs: compile %.1fs warm %.3fs" % (cs, ws),
          flush=True)

    cs, ws = timeit(lambda a, b: st._classes_pairs(*st._tables, a, b),
                    d1, d2)
    print("classes_pairs:      compile %.1fs warm %.3fs" % (cs, ws),
          flush=True)

    # standalone pileup scatter
    P = st.P_bb
    W = st.read_len
    rng = np.random.default_rng(0)
    gp = jnp.asarray(rng.integers(0, P, (n, W)).astype(np.int32))
    cc = jnp.asarray(rng.integers(0, 4, (n, W)).astype(np.int8))

    @jax.jit
    def pile_scatter(gp, cc):
        idx = gp * 6 + cc
        return jnp.zeros(P * 6, jnp.int32).at[
            idx.reshape(-1)].add(jnp.ones(n * W, jnp.int32))

    cs, ws = timeit(pile_scatter, gp, cc)
    print("pileup scatter:     compile %.1fs warm %.3fs" % (cs, ws),
          flush=True)

    # standalone class pack (hash sort + segment dedup)
    W32 = st._W32
    rows = jnp.asarray(rng.integers(0, 2 ** 31, (3 * n, W32),
                                    dtype=np.int64).astype(np.uint32))

    @jax.jit
    def pack(flat):
        mixer = (jnp.arange(W32, dtype=jnp.uint32)
                 * jnp.uint32(0x9E3779B9) + jnp.uint32(0x85EBCA77))
        h = jnp.sum(flat * mixer[None, :], axis=1, dtype=jnp.uint32)
        order = jnp.argsort(h, stable=True)
        fs = flat[order]
        neq = (h[order][1:] != h[order][:-1]) \
            | jnp.any(fs[1:] != fs[:-1], axis=1)
        is_first = jnp.concatenate([jnp.ones(1, bool), neq])
        rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        uw = jax.ops.segment_sum(jnp.ones(flat.shape[0], jnp.int32),
                                 rank, num_segments=flat.shape[0])
        return fs, uw

    cs, ws = timeit(pack, rows)
    print("class pack:         compile %.1fs warm %.3fs" % (cs, ws),
          flush=True)

    # standalone rep-gate gathers
    keep = jnp.asarray(rng.random((P, 4)) < 0.3)

    @jax.jit
    def gate(gp, cc, keep):
        gpc = jnp.clip(gp, 0, P - 1)
        sup = keep[gpc, jnp.clip(cc, 0, 3)]
        nrep = keep.sum(1)[gpc]
        return sup.sum() + nrep.sum()

    cs, ws = timeit(gate, gp, cc, keep)
    print("gate gathers:       compile %.1fs warm %.3fs" % (cs, ws),
          flush=True)

    # spelling-only (mate_spell via debug program: spell + count, ungated)
    cs, ws = timeit(lambda a: st._debug(*st._tables, a), d1)
    print("debug (spell+count):compile %.1fs warm %.3fs" % (cs, ws),
          flush=True)


if __name__ == "__main__":
    main()
