"""CLI (`python -m rolo_tpu`) tests — the `roslaunch rolo rolo_run.launch`
analog (/root/reference/README.md:44-52) exercised in-process: sim export,
directory replay with ATE scoring, and the tpu: config namespace."""

import json
import os

import numpy as np
import pytest

from rolo_tpu.__main__ import main as cli_main
from rolo_tpu.config import load_config

# Matches tests/test_sim.py SIM_SLAM_CFG so jit caches are shared within the
# pytest process (identical static shapes + hashable config equality).
TINY_YAML = """
rolo:
  N_SCAN: 16
  Horizon_SCAN: 512
  lidarMinRange: 1.0
  lidarMaxRange: 60.0
  edgeThreshold: 0.8
  surfThreshold: 0.1
  mappingProcessInterval: 0.05
  loopClosureEnableFlag: false
tpu:
  mapping:
    scan2map_max_iterations: 6
  static:
    max_raw_points: 16384
    max_corner_points: 512
    max_surf_points: 1024
    max_feature_points: 1536
    max_voxels: 4096
    max_keyframes: 64
    max_submap_points: 4096
    max_loop_factors: 16
    max_prior_factors: 16
    knn_query_chunk: 256
"""


class TestConfigTpuNamespace:
    def test_tpu_namespace_applies(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(TINY_YAML)
        cfg = load_config(str(p))
        assert cfg.sensor.n_scan == 16
        assert cfg.static.max_raw_points == 16384
        assert cfg.mapping.scan2map_max_iterations == 6
        from test_sim import SIM_SLAM_CFG

        assert cfg == SIM_SLAM_CFG  # jit-cache equality with test_sim runs

    def test_unknown_tpu_key_is_loud(self, tmp_path):
        p = tmp_path / "bad.yaml"
        p.write_text("tpu:\n  static:\n    max_raw_pointz: 1\n")
        with pytest.raises(ValueError, match="max_raw_pointz"):
            load_config(str(p))

    def test_unknown_tpu_section_is_loud(self, tmp_path):
        p = tmp_path / "bad2.yaml"
        p.write_text("tpu:\n  statics:\n    max_raw_points: 1\n")
        with pytest.raises(ValueError, match="statics"):
            load_config(str(p))

    def test_two_file_layering(self):
        """Reference layout: params.yaml + per-dataset prior_pose_params.yaml
        applied in order (config/M2UD/prior_pose_params.yaml analog)."""
        cfg = load_config([
            "configs/params.yaml",
            "configs/prior_pose_params.yaml",
            "configs/m2ud/prior_pose_params.yaml",
        ])
        assert cfg.prior.vehicle_com_z == 0.18
        assert cfg.prior.wheel_xy == ((-0.4, 0.25), (0.4, 0.25), (0.4, -0.25), (-0.4, -0.25))
        assert cfg.prior.lidar_offset_trans == (0.0, 0.0, 0.27)
        assert cfg.prior.synced_interval == 1.0
        # master prior_factor values survive where not overridden
        assert cfg.prior.factor_weight == 5000.0
        # rolo params from the base file survive
        assert cfg.sensor.n_scan == 32


class TestCli:
    @pytest.mark.slow
    def test_sim_then_run_dir(self, tmp_path, capsys):
        seq_dir = str(tmp_path / "seq")
        rc = cli_main([
            "sim", "--output", seq_dir, "--scans", "8", "--cols", "512",
            "--period", "60", "--seed", "0", "--sensor", "velodyne16",
        ])
        assert rc == 0
        pcds = [f for f in os.listdir(seq_dir) if f.endswith(".pcd")]
        assert len(pcds) == 8
        assert os.path.exists(os.path.join(seq_dir, "gt_tum.txt"))

        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(TINY_YAML)
        out_dir = str(tmp_path / "out")
        rc = cli_main([
            "run", "--input", seq_dir, "--config", str(cfg_path),
            "--gt", os.path.join(seq_dir, "gt_tum.txt"),
            "--output", out_dir, "--progress", "0",
        ])
        assert rc == 0
        captured = capsys.readouterr().out
        tail = captured[captured.index("{"):]
        res = json.loads(tail)
        assert res["n_scans"] == 8
        assert "ate_frontend_rmse_m" in res
        assert res["ate_frontend_rmse_m"] < 0.5
        assert os.path.exists(os.path.join(out_dir, "front_end_tum.txt"))
        assert os.path.exists(os.path.join(out_dir, "result.json"))
