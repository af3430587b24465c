"""Checkpoint / resume for progressive renders.

The reference's render state is implicit — the progressive accumulation
buffer plus the frame counter (``PathTracerMain.cpp:166-182``,
``pathTracerPrograms.cu:803-811``), reset by free+realloc and never saved.
Here it is made real (SURVEY.md §5.4): serialize ``(accum, frame_idx,
config, camera)`` so long renders resume **bit-exactly** — the counter-based
RNG derives every sample from (pixel, sample, frame), so continuing from a
checkpoint reproduces exactly the frames an uninterrupted run would have
produced.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .config import RenderConfig, Quirks

FORMAT_VERSION = 1


def save_checkpoint(path: str, accum, frame_idx: int, cfg: RenderConfig,
                    camera: Camera) -> None:
    """Write render state to an .npz file."""
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["quirks"] = dataclasses.asdict(cfg.quirks)
    np.savez_compressed(
        path,
        version=np.int32(FORMAT_VERSION),
        accum=np.asarray(accum, np.float32),
        frame_idx=np.int64(frame_idx),
        config_json=np.bytes_(json.dumps(cfg_dict).encode()),
        cam_eye=np.asarray(camera.eye, np.float32),
        cam_lookat=np.asarray(camera.lookat, np.float32),
        cam_up=np.asarray(camera.up, np.float32),
        cam_fov_y=np.float32(camera.fov_y),
        cam_aspect=np.float32(camera.aspect),
    )


def load_checkpoint(path: str):
    """Read render state. Returns (accum jnp[H,W,3], frame_idx, cfg, camera)."""
    with np.load(path) as z:
        version = int(z["version"])
        assert version == FORMAT_VERSION, f"unknown checkpoint v{version}"
        accum = jnp.asarray(z["accum"])
        frame_idx = int(z["frame_idx"])
        cfg_dict = json.loads(bytes(z["config_json"]).decode())
        quirks = Quirks(**cfg_dict.pop("quirks"))
        cfg_dict["background"] = tuple(cfg_dict["background"])
        cfg = RenderConfig(**cfg_dict, quirks=quirks)
        camera = Camera(eye=z["cam_eye"], lookat=z["cam_lookat"],
                        up=z["cam_up"], fov_y=float(z["cam_fov_y"]),
                        aspect=float(z["cam_aspect"]))
    return accum, frame_idx, cfg, camera
