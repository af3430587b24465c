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

from .config import RenderConfig, Quirks  # noqa: F401
from .camera import Camera, Trackball, cornell_default_camera  # noqa: F401
from .render import (CameraArrays, RenderStats, render_frame,  # noqa: F401
                     render_wavefront, init_accum, image_to_host)
from .scene import load_scene, SceneArrays  # noqa: F401
