"""TPU smoke: fused packed path fwd/bwd runs and tracks the exact XLA
path (asserted). Run on hardware; not library API."""
import jax, jax.numpy as jnp, numpy as np
from gaussian_splatting_web_tpu.bench_lib import make_scene
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.rasterize import render_impl
from gaussian_splatting_web_tpu.utils.metrics import enable_compile_cache
enable_compile_cache()
W, H = 512, 512
cloud = jax.device_put(make_scene(50_000))
camera = jax.device_put(cam.default_camera(W, H, eye=np.array([0,0,-8.]), center=np.zeros(3)))
config = RenderConfig()
img, aux = jax.jit(lambda c: render_impl(c, camera, W, H, config))(cloud)
print("fwd ok", float(jnp.sum(img)))
def loss(c):
    img, _ = render_impl(c, camera, W, H, config)
    return jnp.sum(img)
g = jax.jit(jax.grad(loss))(cloud)
print("bwd ok", float(jnp.sum(jnp.abs(g.xyz))))
# cross-check against the exact mode on TPU
cfg2 = RenderConfig(use_pallas="never", pack_fields=False)
img2, _ = jax.jit(lambda c: render_impl(c, camera, W, H, cfg2))(cloud)
print("maxdiff packed-pallas vs exact-xla:", float(jnp.max(jnp.abs(img - img2))))
# assert rather than eyeball (ADVICE r2 item 1): packed-pallas vs exact-xla
# image error is the documented bf16 payload quantization, ~1e-3 abs
_md = float(jnp.max(jnp.abs(img - img2)))
assert _md < 2e-2, f"packed-vs-exact maxdiff {_md}"
print("smoke ok")
