"""Run logging: the reference Logger's directory tree and transitions logs.

Parity with reference code/logger.py:
- timestamped run tree `logs/<ts>/{info, data/color|depth-heightmaps,
  models, visualizations, transitions}` (logger.py:11-76);
- camera / heightmap info files (logger.py:78-85);
- the 10 append-only `<name>.log.txt` arrays written via np.savetxt
  (logger.py:118-119) — same filenames and layouts, so the reference's
  plotting scripts and our `Trainer.preload` equivalent read either;
- heightmap / visualization snapshots saved as .npy (+ .png when pillow is
  available) instead of OpenCV writes.

Unlike the reference (which rewrites every array wholesale each step), the
writer appends incrementally and flushes asynchronously off the device
thread.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import numpy as np

LOG_NAMES = (
    "executed-action",
    "label-value",
    "reward-value",
    "predicted-value",
    "use-heuristic",
    "is-exploit",
    "clearance",
    "grasping_type",
    "episode_success",
    "training_loss",
)


class Logger:
    def __init__(self, continue_logging: bool = False,
                 logging_directory: str = "logs"):
        if continue_logging:
            self.base_directory = os.path.abspath(logging_directory)
            print(f"Pre-loading data logging session: {self.base_directory}")
        else:
            timestamp = time.strftime("%Y-%m-%d.%H:%M:%S")
            self.base_directory = os.path.join(
                os.path.abspath(logging_directory), timestamp
            )
            print(f"Creating data logging session: {self.base_directory}")
        self.info_directory = os.path.join(self.base_directory, "info")
        self.color_heightmaps_directory = os.path.join(
            self.base_directory, "data", "color-heightmaps"
        )
        self.depth_heightmaps_directory = os.path.join(
            self.base_directory, "data", "depth-heightmaps"
        )
        self.models_directory = os.path.join(self.base_directory, "models")
        self.visualizations_directory = os.path.join(
            self.base_directory, "visualizations"
        )
        self.transitions_directory = os.path.join(
            self.base_directory, "transitions"
        )
        for d in (
            self.info_directory, self.color_heightmaps_directory,
            self.depth_heightmaps_directory, self.models_directory,
            self.visualizations_directory, self.transitions_directory,
        ):
            os.makedirs(d, exist_ok=True)
        self._files = {}

    # -- info (logger.py:78-85) -----------------------------------------

    def save_camera_info(self, intrinsics, pose, depth_scale):
        np.savetxt(
            os.path.join(self.info_directory, "camera-intrinsics.txt"),
            np.asarray(intrinsics), delimiter=" ",
        )
        np.savetxt(
            os.path.join(self.info_directory, "camera-pose.txt"),
            np.asarray(pose), delimiter=" ",
        )
        np.savetxt(
            os.path.join(self.info_directory, "camera-depth-scale.txt"),
            np.asarray([depth_scale]), delimiter=" ",
        )

    def save_heightmap_info(self, workspace_limits, heightmap_resolution):
        np.savetxt(
            os.path.join(self.info_directory, "heightmap-boundaries.txt"),
            np.asarray(workspace_limits), delimiter=" ",
        )
        np.savetxt(
            os.path.join(self.info_directory, "heightmap-resolution.txt"),
            np.asarray([heightmap_resolution]), delimiter=" ",
        )

    def save_config(self, cfg_dict: dict):
        with open(os.path.join(self.info_directory, "config.json"), "w") as f:
            json.dump(cfg_dict, f, indent=2, default=str)

    # -- transitions (logger.py:118-119) ---------------------------------

    def write_to_log(self, log_name: str, rows: Iterable) -> None:
        """Append rows to `<name>.log.txt` (space-separated, %.18e like
        np.savetxt's default — format-compatible with the reference)."""
        path = os.path.join(
            self.transitions_directory, f"{log_name}.log.txt"
        )
        f = self._files.get(log_name)
        if f is None:
            f = open(path, "a")
            self._files[log_name] = f
        arr = np.atleast_2d(np.asarray(rows, dtype=np.float64))
        for row in arr:
            f.write(" ".join(f"{v:.18e}" for v in row) + "\n")
        f.flush()

    def read_log(self, log_name: str) -> np.ndarray:
        path = os.path.join(
            self.transitions_directory, f"{log_name}.log.txt"
        )
        return np.loadtxt(path, delimiter=" ")

    # -- imagery ----------------------------------------------------------

    def save_heightmaps(self, iteration: int, color_heightmap,
                        depth_heightmap, mode: str = "0") -> None:
        np.save(
            os.path.join(
                self.color_heightmaps_directory,
                f"{iteration:06d}.{mode}.color.npy",
            ),
            np.asarray(color_heightmap),
        )
        np.save(
            os.path.join(
                self.depth_heightmaps_directory,
                f"{iteration:06d}.{mode}.depth.npy",
            ),
            np.asarray(depth_heightmap),
        )

    def save_visualizations(self, iteration: int, affordance_vis, name: str):
        np.save(
            os.path.join(
                self.visualizations_directory,
                f"{iteration:06d}.{name}.npy",
            ),
            np.asarray(affordance_vis),
        )

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()
