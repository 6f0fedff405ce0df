"""Config/CLI parsing and run-logger tests."""

import numpy as np

from smg_tpu.utils import config as cfg_mod
from smg_tpu.utils.logger import Logger


class TestConfig:
    def test_reference_command_lines_parse(self):
        """The five BASELINE.json run configurations parse unchanged."""
        cmds = [
            "--is_sim --method reactive --is_pe --is_oo --explore_rate_decay",
            "--is_sim --method reinforcement --is_pe --is_oo",
            "--is_sim --method reactive --is_ets --is_pe --is_oo",
            "--is_sim --method reinforcement --is_ets --is_pe --is_oo",
            "--is_sim --method reinforcement --is_ets --is_pe --is_oo "
            "--is_cluttered",
        ]
        for cmd in cmds:
            cfg = cfg_mod.parse_args(cmd.split())
            assert cfg.env.method in ("reactive", "reinforcement")
        last = cfg_mod.parse_args(cmds[-1].split())
        assert last.env.is_cluttered and last.env.is_ets

    def test_testing_flags(self):
        cfg = cfg_mod.parse_args(
            "--is_testing --load_snapshot --snapshot_file /tmp/x".split()
        )
        assert cfg.env.is_testing and cfg.load_snapshot
        assert cfg.snapshot_file == "/tmp/x"

    def test_defaults_match_reference(self):
        cfg = cfg_mod.parse_args([])
        assert cfg.training_episode == 800      # main.py:447
        assert cfg.testing_episode == 300       # main.py:448
        assert cfg.env.step_limit == 20         # main.py:449
        assert cfg.train.target_update_freq == 10
        assert cfg.train.future_reward_discount == 0.5

    def test_tpu_knobs(self):
        cfg = cfg_mod.parse_args(
            "--batch_size 64 --trunk tiny --input_size 640 --seed 7".split()
        )
        assert cfg.loop.batch_size == 64
        assert cfg.train.model.trunk == "tiny"
        assert cfg.train.model.input_size == 640
        assert cfg.seed == 7

    def test_to_dict_serializable(self):
        import json

        cfg = cfg_mod.parse_args([])
        json.dumps(cfg.to_dict(), default=str)


class TestLogger:
    def test_run_tree_and_transitions(self, tmp_path):
        lg = Logger(False, str(tmp_path))
        lg.save_camera_info(np.eye(3), np.eye(4), 1.0)
        lg.save_heightmap_info(np.zeros((3, 2)), 0.002)
        lg.write_to_log("executed-action", [[1, 0, 10, 20, 0, 0, 0]])
        lg.write_to_log("executed-action", [[0, 0, 5, 6, 0, 7, 8]])
        lg.write_to_log("training_loss", [[1, 0.5]])
        back = lg.read_log("executed-action")
        assert back.shape == (2, 7)
        assert back[0, 0] == 1.0
        # np.loadtxt-compatible (the reference preload path,
        # trainer.py:119).
        assert np.loadtxt(
            f"{lg.transitions_directory}/training_loss.log.txt"
        ).tolist() == [1.0, 0.5]
        lg.close()

    def test_continue_logging_reuses_directory(self, tmp_path):
        lg = Logger(False, str(tmp_path))
        lg.write_to_log("reward-value", [[1.0]])
        lg.close()
        lg2 = Logger(True, lg.base_directory)
        lg2.write_to_log("reward-value", [[2.0]])
        lg2.close()
        assert lg2.read_log("reward-value").tolist() == [1.0, 2.0]

    def test_heightmap_save(self, tmp_path):
        lg = Logger(False, str(tmp_path))
        lg.save_heightmaps(3, np.zeros((224, 224, 3)), np.zeros((224, 224)))
        import os

        assert os.path.exists(
            f"{lg.color_heightmaps_directory}/000003.0.color.npy"
        )
        lg.close()


class TestAsyncLogger:
    def test_async_rows_ordered_and_flushed(self, tmp_path):
        from smg_tpu.utils.logger import Logger

        lg = Logger(False, str(tmp_path))
        for i in range(50):
            lg.write_to_log("training_loss", [[float(i), float(i) * 0.5]])
        lg.flush()
        arr = lg.read_log("training_loss")
        assert arr.shape == (50, 2)
        assert arr[:, 0].tolist() == [float(i) for i in range(50)]
        lg.close()

    def test_sync_mode_equivalent(self, tmp_path):
        from smg_tpu.utils.logger import Logger

        lg = Logger(False, str(tmp_path), async_writes=False)
        lg.write_to_log("reward-value", [[1.5], [2.5]])
        assert lg.read_log("reward-value").tolist() == [1.5, 2.5]
        lg.close()

    def test_native_binary_mirror(self, tmp_path):
        from smg_tpu.utils import native as native_mod
        from smg_tpu.utils.logger import Logger

        lg = Logger(False, str(tmp_path))
        if not lg._native_ok:
            import pytest

            pytest.skip("native library unavailable")
        lg.write_to_log("reward-value", [[1.0], [2.0], [3.0]])
        lg.close()
        import os

        rows = native_mod.read_binary_log(
            os.path.join(lg.transitions_directory, "reward-value.log.bin")
        )
        assert [float(r[0]) for r in rows] == [1.0, 2.0, 3.0]

    def test_imagery_pngs(self, tmp_path):
        import os

        from smg_tpu.utils.logger import Logger

        lg = Logger(False, str(tmp_path))
        color = np.random.RandomState(0).rand(32, 32, 3)
        depth = np.random.RandomState(1).rand(32, 32) * 0.1
        lg.save_heightmaps(7, color, depth)
        lg.save_visualizations(7, color, "action")
        assert os.path.exists(
            f"{lg.color_heightmaps_directory}/000007.0.color.png"
        )
        assert os.path.exists(
            f"{lg.depth_heightmaps_directory}/000007.0.depth.png"
        )
        assert os.path.exists(
            f"{lg.visualizations_directory}/000007.action.png"
        )
        # Depth PNG preserves the x100000 uint16 scale.
        from PIL import Image

        img = np.asarray(Image.open(
            f"{lg.depth_heightmaps_directory}/000007.0.depth.png"
        ))
        np.testing.assert_allclose(
            img, np.clip(depth * 100000.0, 0, 65535).astype(np.uint16)
        )
        lg.close()
