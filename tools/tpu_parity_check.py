"""TPU-vs-CPU float32 parity probe: the default pipeline must be
BIT-IDENTICAL across backends (guards against XLA matmul-precision drift:
TPU's default dot precision can be bf16 for f32 operands; every matmul in
the pipeline pins its accumulation/precision so this probe stays at 0.0).

Run via tools/tpu_run.sh; asserts exact equality.
"""
import numpy as np, jax, jax.numpy as jnp
from auditory_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from conftest import default_cfg_2d, tone
from auditory_tpu.pipeline.sndenv import SndEnv

cfg = default_cfg_2d()
sig = tone(1234.0, 0.5, 16000).astype(np.float32)

env = SndEnv(cfg, 16000, dtype=jnp.float32)
sigp = env.pad(sig)
out_tpu = env.process(sigp)
mel_tpu = np.asarray(out_tpu.mel_fbank_segment)
pow_tpu = np.asarray(out_tpu.power_segment)

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    env_c = SndEnv(cfg, 16000, dtype=jnp.float32)
    out_cpu = env_c.process(env_c.pad(sig))
    mel_cpu = np.asarray(out_cpu.mel_fbank_segment)
    pow_cpu = np.asarray(out_cpu.power_segment)

def rep(tag, a, b):
    d = np.abs(a - b)
    rel = d.max() / max(np.abs(b).max(), 1e-12)
    print(f"{tag}: max abs {d.max():.3e}  max rel-to-peak {rel:.3e}")
rep("power TPU vs CPU-f32", pow_tpu, pow_cpu)
rep("mel   TPU vs CPU-f32", mel_tpu, mel_cpu)
# hot band check
hb = mel_cpu[0].mean(axis=1).argmax()
print("hot band mel diff:", np.abs(mel_tpu[0, hb] - mel_cpu[0, hb]).max())
assert np.array_equal(pow_tpu, pow_cpu), "TPU power deviates from CPU f32"
assert np.array_equal(mel_tpu, mel_cpu), "TPU mel deviates from CPU f32"
print("BIT-IDENTICAL: TPU f32 == CPU f32")
