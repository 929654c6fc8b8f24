"""Microbenchmark the GAN discriminator's hot formulations on the TPU.

The train-step profile (scripts/profile_train_step.py) attributes ~20% of
device time to the discriminators' 2D convs (nn/conv.py:265) plus ~8% to
their leaky_relu fmaps (models/discriminator.py:28). Candidates measured
here, each fwd + bwd at the training shapes (batch 4, 1 s segments):

  mpd2d    current MPD: (B, T/p, p, 1) NHWC convs, kernel (5,1) stride (3,1)
  mpd1d    period-folded: (B*p, T/p, 1) 1D convs, kernel 5 stride 3 — the
           (5,1) conv convolves only along H, so W==p is pure batch; the
           fold makes the conv emitter see one dense 1D problem
  mrd      current MRD band convs ((3,9) kernels, C=32)
  disc     the full ensemble forward+backward (5 MPD + 3 MRD)
  disc2x   ensemble on concat(fake, real) (one call at 2B) vs two calls

Remember the round-2 lesson (CLAUDE.md): microbench wins routinely vanish
end to end — any winner must move bench_train.py before it ships.

Usage: python scripts/bench_disc.py [batch] [T]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from facodec_tpu.models.discriminator import MPD, MRD, Discriminator  # noqa: E402
from facodec_tpu.nn.conv import Conv1d  # noqa: E402

import flax.linen as nn  # noqa: E402


class MPDFolded(nn.Module):
    """MPD with the period axis folded into batch: numerically the same
    convolution (kernel (5,1) never mixes period columns)."""

    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, T, _ = x.shape
        p = self.period
        pad = p - T % p
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        # (B, H, p, 1) -> (B, p, H, 1) -> (B*p, H, 1)
        x = x.reshape(B, -1, p, 1).transpose(0, 2, 1, 3).reshape(B * p, -1, 1)
        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for i, (cin, cout) in enumerate(chans):
            x = Conv1d(cin, cout, 5, stride=3, padding=2,
                       weight_norm=True, name=f"convs_{i}_0")(x)
            x = nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = Conv1d(1024, 1024, 5, stride=1, padding=2, weight_norm=True,
                   name="convs_4_0")(x)
        x = nn.leaky_relu(x, 0.1)
        fmap.append(x)
        x = Conv1d(1024, 1, 3, padding=1, weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return fmap


def timeit(fn, *args, iters=8):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    s = float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, s


def fwd_bwd(apply_fn):
    def f(params, x):
        def loss(p, x):
            fmaps = apply_fn(p, x)
            leaves = jax.tree.leaves(fmaps)
            return sum(jnp.mean(jnp.square(l.astype(jnp.float32))) for l in leaves)

        l, g = jax.value_and_grad(loss)(params, x)
        return l, jax.tree.leaves(g)[0]

    return f


def main(batch=4, T=24000):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, T, 1)) * 0.1, jnp.float32)
    x2 = jnp.concatenate([x, x + 0.01], axis=0)
    key = jax.random.PRNGKey(0)

    for p in (2, 11):
        m2d = MPD(p)
        v2d = m2d.init(key, x)
        m1d = MPDFolded(p)
        v1d = m1d.init(key, x)
        ms2, _ = timeit(fwd_bwd(lambda v, x: m2d.apply(v, x)), v2d, x)
        ms1, _ = timeit(fwd_bwd(lambda v, x: m1d.apply(v, x)), v1d, x)
        print(f"MPD p={p:2d}: conv2d {ms2:7.2f} ms   folded-1d {ms1:7.2f} ms")

    mrd = MRD(2048, sample_rate=24000)
    vmrd = mrd.init(key, x)
    ms, _ = timeit(fwd_bwd(lambda v, x: mrd.apply(v, x)), vmrd, x)
    print(f"MRD 2048: {ms:7.2f} ms")

    disc = Discriminator(sample_rate=24000)
    vd = disc.init(key, x)
    msd, _ = timeit(fwd_bwd(lambda v, x: disc.apply(v, x)), vd, x)
    print(f"Discriminator ensemble fwd+bwd (batch {batch}): {msd:7.2f} ms")
    msd2, _ = timeit(fwd_bwd(lambda v, x: disc.apply(v, x)), vd, x2)
    two = 2 * msd
    print(f"  one call at 2B: {msd2:7.2f} ms   vs two calls: {two:7.2f} ms")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 24000
    main(b, t)
