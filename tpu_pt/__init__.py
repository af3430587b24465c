"""tpu_pt — a TPU-native progressive path-tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``fallinbryan/ACGPathTracing`` (an OptiX 8.0 megakernel path tracer):
OBJ scenes with name-classified diffuse/GGX-metallic/refractive BSDFs,
cosine-weighted importance sampling, area-light next-event estimation,
Russian-roulette termination with 1-28 bounce control, progressive
accumulation with sRGB tonemapping, and an interactive viewer — re-designed
as a wavefront renderer: fixed-shape ray SoA, ``lax.scan`` bounce loops,
counter-based RNG, dense/Pallas/LBVH intersection backends, and device-mesh
sharding for multi-chip rendering.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (the reference's PTX/OptiX-IR disk
    cache, ``sutil.cpp:986-1029`` — compiled device code reused across
    runs). Kernels here take 60-90 s to compile on TPU; the cache makes
    every process after the first start in seconds. Opt out with
    TPU_PT_NO_COMPILE_CACHE=1 or point TPU_PT_COMPILE_CACHE elsewhere."""
    if _os.environ.get("TPU_PT_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        path = _os.environ.get(
            "TPU_PT_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "tpu_pt_xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass    # never let cache setup break rendering


_enable_compile_cache()

from .config import RenderConfig, Quirks  # noqa: F401
from .camera import Camera, Trackball, cornell_default_camera  # noqa: F401
from .render import (CameraArrays, RenderStats, render_frame,  # noqa: F401
                     render_wavefront, init_accum, image_to_host)
from .scene import load_scene, SceneArrays  # noqa: F401
from . import vmath  # noqa: F401  — public [..., 3] vector math (README §Library)
