"""Which op inside the placement correlation pays the ~300-800 s
first-compile on the tunneled TPU?  Compile, in order: bare dot of the
same shape, the im2col windows gather, one_hot, correlate, argmax."""
import sys, time
sys.path.insert(0, "."); sys.path.insert(0, "tests")
import jax, jax.numpy as jnp, numpy as np

def t(label, fn, *args):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    print("%-22s compile %7.1fs warm %.4fs" % (label, c, time.time() - t0),
          flush=True)

n, m, P1 = 12288, 100, 3100
rng = np.random.default_rng(0)
lhs = jnp.asarray(rng.random((n, m * 5)).astype(np.float32))
rhsT = jnp.asarray(rng.random((P1, m * 5)).astype(np.float32))
pwm_ext = jnp.asarray(rng.random((P1 + m - 1, 5)).astype(np.float32))
reads = jnp.asarray(rng.integers(0, 4, (n, m)).astype(np.int8))

print("backend:", jax.default_backend(), flush=True)
t("bare f32 dot", jax.jit(lambda a, b: jnp.dot(a, b.T)), lhs, rhsT)
t("bf16 dot pref f32", jax.jit(
    lambda a, b: jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.float32)), lhs, rhsT)

def windows_only(pwm_ext):
    idx = jnp.arange(P1)[:, None] + jnp.arange(m)[None, :]
    return pwm_ext.astype(jnp.bfloat16)[idx].reshape(P1, m * 5)
t("windows gather", jax.jit(windows_only), pwm_ext)

def onehot_only(reads):
    return jax.nn.one_hot(reads, 5, dtype=jnp.bfloat16).reshape(n, m * 5)
t("one_hot", jax.jit(onehot_only), reads)

from hgtpu.ops.placement import correlate_scores
t("correlate", jax.jit(lambda p, r: correlate_scores(p, r)), pwm_ext, reads)
t("corr+argmax", jax.jit(
    lambda p, r: jnp.argmax(correlate_scores(p, r), 1)), pwm_ext, reads)
