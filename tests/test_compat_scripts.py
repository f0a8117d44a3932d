"""Compat-layer API + CLI script smoke tests."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENV = {**os.environ}
_ENV.pop("PALLAS_AXON_POOL_IPS", None)
_ENV["JAX_PLATFORMS"] = "cpu"
_ENV["XLA_FLAGS"] = (_ENV.get("XLA_FLAGS", "")
                     + " --xla_force_host_platform_device_count=8").strip()


def test_compat_voxelgrid_signature():
    from real_robot_nerf_actor_tpu.compat import VoxelGrid
    vg = VoxelGrid(coord_bounds=[-0.1, -0.3, -0.2, 0.8, 0.7, 0.7],
                   voxel_size=10, device="cuda:0", batch_size=1,
                   feature_size=3, max_num_coords=500)
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 0.5, (1, 300, 3)).astype(np.float32)
    rgb = rng.uniform(-1, 1, (1, 300, 3)).astype(np.float32)
    vox = vg.coords_to_bounding_voxel_grid(coords, coord_features=rgb)
    assert vox.shape == (1, 10, 10, 10, 10)
    feats = vg.coords_to_bounding_voxel_grid(coords, coord_features=rgb,
                                             only_features=True)
    assert feats.shape == (1, 10, 10, 10, 3)


def test_compat_choose_highest_action_channel_first():
    from real_robot_nerf_actor_tpu.compat import choose_highest_action
    q = np.zeros((1, 1, 6, 6, 6), np.float32)
    q[0, 0, 2, 3, 4] = 5.0
    rg = np.zeros((1, 3 * 72 + 2), np.float32)
    cc = np.zeros((1, 2), np.float32)
    coords, _, _ = choose_highest_action(q, rg, cc)
    np.testing.assert_array_equal(np.asarray(coords)[0], [2, 3, 4])


@pytest.mark.parametrize("script,args", [
    ("scripts/train_peract.py",
     ["--steps", "2",
      "-o", "model.voxel_size=10", "-o", "model.depth=1",
      "-o", "model.num_latents=8", "-o", "model.latent_dim=16",
      "-o", "model.im_channels=8", "-o", "model.cross_dim_head=8",
      "-o", "model.latent_dim_head=8", "-o", "model.latent_heads=1",
      "-o", "model.final_dim=8", "-o", "model.lang_emb_dim=8",
      "-o", "model.lang_max_seq_len=4",
      "-o", "voxelizer.voxel_size=10", "-o", "voxelizer.max_num_coords=2000",
      "-o", "train.log_every=1"]),
    ("scripts/gen_data.py", ["nerf", "--task", "lift", "--n", "1",
                             "--views", "3", "--image-size", "16"]),
])
def test_cli_scripts_smoke(tmp_path, script, args):
    if "gen_data" in script:
        args = args + ["--out", str(tmp_path / "out")]
    r = subprocess.run([sys.executable, os.path.join(REPO, script), *args],
                       env=_ENV, capture_output=True, text=True, timeout=900,
                       cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]


def test_yaml_configs_load():
    from real_robot_nerf_actor_tpu.train import PerActConfig, NerfActConfig
    from real_robot_nerf_actor_tpu.train.featurenerf import FeatureNerfConfig
    from real_robot_nerf_actor_tpu.utils.config import load_config
    p = load_config(PerActConfig, os.path.join(REPO, "configs/peract.yaml"),
                    overrides=[])
    assert p.model.num_latents == 2048 and p.train.optim.lr == 1e-4
    n = load_config(NerfActConfig, os.path.join(REPO, "configs/nerfact.yaml"))
    assert n.lambda_nerf == 10.0
    assert n.peract.model.input_encoder == "unet"
    assert n.renderer.field.d_embed == 512
    f = load_config(FeatureNerfConfig,
                    os.path.join(REPO, "configs/featurenerf.yaml"))
    assert f.model.d_embed == 384
    # the committed serving default must keep encoding the quality-gated
    # mode bench.py's headline runs (occ_int8_cull16 in eval_quality)
    s = load_config(NerfActConfig, os.path.join(REPO, "configs/serve.yaml"))
    assert s.renderer.sampling_mode == "occupancy"
    assert s.renderer.field.mlp_backend == "pallas_int8"
    assert (s.renderer.n_coarse, s.renderer.n_fine,
            s.renderer.n_fine_depth) == (16, 8, 0)
    assert s.renderer.occ_tighten and s.renderer.field.mask_outside
    assert s.renderer.use_ray_plan
    # same policy architecture as the parity config
    assert s.peract.model.num_latents == n.peract.model.num_latents
    # dot-path override
    p2 = load_config(PerActConfig, os.path.join(REPO, "configs/peract.yaml"),
                     overrides=["train.optim.lr=3e-4", "model.depth=2"])
    assert p2.train.optim.lr == 3e-4 and p2.model.depth == 2


def test_featurenerf_cli_smoke(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/train_featurenerf.py"),
         "--steps", "2", "--log-dir", str(tmp_path / "log"),
         "-o", "model.d_embed=8", "-o", "model.d_hidden=16",
         "-o", "model.n_blocks=2", "-o", "model.combine_layer=1",
         "-o", "ray_batch_size=16",
         "-o", "renderer.n_coarse=4", "-o", "renderer.n_fine=2",
         "-o", "renderer.n_fine_depth=0", "-o", "train.log_every=1"],
        env=_ENV, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
