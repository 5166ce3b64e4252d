"""Config system: OmegaConf-style YAML with `{target, params}` instantiation.

Parity: sgm/util.py:147-199 (`instantiate_from_config`, `get_obj_from_str`)
and the two-tier config layout of the reference (flat run configs +
recursive model graphs, SURVEY.md §5). omegaconf is not available in this
environment, so `ConfigNode` provides the dot-access/dict duality the entry
scripts rely on, backed by PyYAML.

Reference `target:` strings (sgm.modules...) are remapped to the TPU-native
classes so the published YAML model graphs keep working unchanged.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Optional

import yaml


class ConfigNode(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, name, default=None):
        return super().get(name, default)

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj


def load_config(path: str) -> ConfigNode:
    with open(path) as f:
        return ConfigNode.wrap(yaml.safe_load(f))


def loads_config(text: str) -> ConfigNode:
    return ConfigNode.wrap(yaml.safe_load(text))


# Reference dotted paths → TPU-native equivalents. The right-hand side is a
# dotted path into this package (resolved lazily).
TARGET_REMAP: Dict[str, str] = {
    # engine
    "sgm.models.diffusion.DiffusionEngine": "udifftext_tpu.builders.build_diffusion_engine",
    # schedules / diffusion math
    "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization": "udifftext_tpu.diffusion.schedules.LegacyDDPMDiscretization",
    "sgm.modules.diffusionmodules.discretizer.EDMDiscretization": "udifftext_tpu.diffusion.schedules.EDMDiscretization",
    "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling": "udifftext_tpu.builders.build_discrete_sampling",
    "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling": "udifftext_tpu.diffusion.schedules.EDMSampling",
    "sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser": "udifftext_tpu.builders.build_discrete_denoiser",
    "sgm.modules.diffusionmodules.guiders.VanillaCFG": "udifftext_tpu.diffusion.guiders.VanillaCFG",
    "sgm.modules.diffusionmodules.guiders.IdentityGuider": "udifftext_tpu.diffusion.guiders.IdentityGuider",
    # autoencoding (generic AutoencodingEngine YAML surface)
    "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer": "udifftext_tpu.diffusion.vae_loss.DiagonalGaussianRegularizer",
}


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """sgm/util.py:178-185 semantics, with reference-target remapping."""
    string = TARGET_REMAP.get(string, string)
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Dict[str, Any]) -> Any:
    """sgm/util.py:168-175 semantics."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    params = config.get("params", dict()) or dict()
    return get_obj_from_str(config["target"])(**params)
