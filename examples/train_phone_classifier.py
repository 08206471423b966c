"""End-to-end demo: auditory features -> neural network, the role the
reference plays in the emergent ecosystem (an A1-cortex-like input layer).

Synthesizes CV-like tokens (distinct formant pairs per class), extracts
gabor-kwta features with the batched SndEnv pipeline, and trains a small MLP
classifier on them with optax -- everything jitted, shardable over the mesh.

Usage: python examples/train_phone_classifier.py [--steps 200]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def synth_token(cls: int, rng: np.random.Generator, sr: int = 16000,
                dur: float = 0.15) -> np.ndarray:
    """A CV-ish token: two formant tones + onset transient + noise."""
    formants = [
        (300, 2300), (600, 1200), (800, 1800),
        (400, 900), (350, 1700), (700, 2500),
    ]
    f1, f2 = formants[cls % len(formants)]
    n = int(dur * sr)
    t = np.arange(n) / sr
    jit1 = rng.uniform(0.95, 1.05)
    jit2 = rng.uniform(0.95, 1.05)
    env = np.minimum(t / 0.02, 1.0) * np.exp(-t * 3.0)
    sig = env * (
        0.5 * np.sin(2 * np.pi * f1 * jit1 * t)
        + 0.35 * np.sin(2 * np.pi * f2 * jit2 * t)
    )
    sig += 0.01 * rng.standard_normal(n)
    return sig.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n-per-class", type=int, default=40)
    ap.add_argument("--classes", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from auditory_tpu.config import GaborSet, SndEnvConfig, default_gabor_specs
    from auditory_tpu.pipeline.batch import BatchedSndEnv, bucket_length
    from auditory_tpu.pipeline.sndenv import SndEnv

    sr = 16000
    rng = np.random.default_rng(0)

    # ---- data: synthetic CV tokens -> pipeline features -----------------
    cfg = SndEnvConfig(
        gabor=GaborSet(
            size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
            specs=default_gabor_specs(phases=(0.0, 1.5708)),
        )
    )
    env = SndEnv(cfg, sr, outputs=("gabor_kwta", "step_valid"))
    benv = BatchedSndEnv(env)

    n_total = args.classes * args.n_per_class
    labels = np.repeat(np.arange(args.classes), args.n_per_class)
    sigs = [env.pad(synth_token(c, rng, sr)) for c in labels]
    n_pad = bucket_length(max(len(s) for s in sigs), env.timing)
    batch = np.zeros((n_total, n_pad), np.float32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
    lengths = np.array([len(s) for s in sigs], np.int32)

    out, _ = benv.process(batch, lengths)
    feats = np.asarray(out.gabor_kwta).reshape(n_total, -1)  # A1 input layer
    print(f"features: {feats.shape} from {n_total} tokens")

    perm = rng.permutation(n_total)
    split = int(0.8 * n_total)
    xtr, xte = feats[perm[:split]], feats[perm[split:]]
    ytr, yte = labels[perm[:split]], labels[perm[split:]]

    # ---- model: 2-layer MLP ---------------------------------------------
    din, dh, dout = feats.shape[1], 64, args.classes
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "w1": jax.random.normal(k0, (din, dh)) * (2.0 / din) ** 0.5,
        "b1": jnp.zeros(dh),
        "w2": jax.random.normal(k1, (dh, dout)) * (2.0 / dh) ** 0.5,
        "b2": jnp.zeros(dout),
    }
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    def forward(p, x):
        h = jax.nn.relu(x @ p["w1"] + p["b1"])
        return h @ p["w2"] + p["b2"]

    @jax.jit
    def step(p, s, x, y):
        def loss_fn(p):
            logits = forward(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    xtr_d, ytr_d = jnp.asarray(xtr), jnp.asarray(ytr)
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, xtr_d, ytr_d)
        if i % 50 == 0 or i == args.steps - 1:
            acc = float(
                (jnp.argmax(forward(params, jnp.asarray(xte)), -1)
                 == jnp.asarray(yte)).mean()
            )
            print(f"step {i}: loss {float(loss):.4f} test acc {acc:.3f}")

    acc = float(
        (jnp.argmax(forward(params, jnp.asarray(xte)), -1)
         == jnp.asarray(yte)).mean()
    )
    print(f"final test accuracy: {acc:.3f} ({args.classes} classes)")


if __name__ == "__main__":
    main()
