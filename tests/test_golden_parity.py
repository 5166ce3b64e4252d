"""Golden-parity harness (scripts/golden_parity.py): clean skip without a
checkpoint, and a full fixed-seed torch-vs-JAX sampling comparison on a tiny
graph with a random-init checkpoint (the full-scale protocol at toy size)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from torch_ref import install_stubs, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference tree not mounted"
)


def _cpu_env():
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON_", "AXON_")) and not k.startswith("TPU_")
    }
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_skips_cleanly_without_checkpoint(tmp_path):
    out = subprocess.run(
        [sys.executable, "scripts/golden_parity.py",
         "--ckpt", str(tmp_path / "absent.ckpt")],
        capture_output=True, text=True, cwd="/root/repo", env=_cpu_env(),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "SKIPPED" in out.stdout


def test_tiny_fixed_seed_parity(tmp_path):
    """Random-init tiny checkpoint → both frameworks sample the same latents
    (BASELINE config 1 protocol at 32²)."""
    install_stubs()
    import torch

    sys.path.insert(0, "/root/repo/scripts")
    sys.path.insert(0, "/root/repo")
    from test_cli_scripts import TINY_MODEL_YAML

    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(TINY_MODEL_YAML)

    from udifftext_tpu.config import load_config

    sys.path.insert(0, "/root/repo/tests")
    import importlib

    gp = importlib.import_module("golden_parity")
    model_cfg = load_config(str(model_yaml))
    unet, vae, le = gp.build_torch_side(model_cfg, {})

    g = torch.Generator().manual_seed(7)
    sd = {}
    with torch.no_grad():
        for prefix, module in (
            ("model.diffusion_model.", unet),
            ("first_stage_model.", vae),
            ("conditioner.embedders.0.", le),
        ):
            for name, p in module.state_dict().items():
                if p.dtype.is_floating_point:
                    p.copy_(torch.randn(p.shape, generator=g) * 0.05)
                sd[prefix + name] = p.numpy()
    ckpt = tmp_path / "tiny.ckpt"
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}}, ckpt)

    out = subprocess.run(
        [sys.executable, "scripts/golden_parity.py",
         "--ckpt", str(ckpt), "--model_cfg", str(model_yaml),
         "--config", "1", "--size", "32", "--steps", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=_cpu_env(),
        timeout=900,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "PASS" in out.stdout, out.stdout
