"""Import the torch reference (/root/reference) as a golden-parity oracle.

The reference depends on pytorch_lightning / xformers / kornia / open_clip /
timm which are not installed; we stub just enough for the pure-torch modules
(UNet, VAE, LabelEncoder) to build and run. Tests using this helper must skip
when the reference tree is unavailable.

This module does NOT copy reference code into the repo — it imports the
mounted read-only tree at test time to verify numerical parity.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "sgm").exists()


_installed = False


def _mkmod(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def install_stubs():
    global _installed
    if _installed:
        return
    import torch

    # --- pytorch_lightning ---
    pl = _mkmod("pytorch_lightning")

    class LightningModule(torch.nn.Module):
        def log_dict(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        def save_hyperparameters(self, *a, **k):
            self.hparams = types.SimpleNamespace()

        @property
        def _device(self):
            return torch.device("cpu")

    pl.LightningModule = LightningModule
    pl.seed_everything = lambda *a, **k: None
    pl.Trainer = object
    sys.modules["pytorch_lightning"] = pl

    # --- xformers (softmax attention fallback, same math) ---
    xf = _mkmod("xformers")
    xf_ops = _mkmod("xformers.ops")

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
        scale = q.shape[-1] ** -0.5
        attn = (q @ k.transpose(-1, -2) * scale).softmax(dim=-1)
        return attn @ v

    xf_ops.memory_efficient_attention = memory_efficient_attention
    xf.ops = xf_ops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = xf_ops

    # --- kornia / open_clip (imported but unused by the core models) ---
    for name in ("kornia", "open_clip"):
        sys.modules.setdefault(name, _mkmod(name))

    # --- omegaconf (only ListConfig/DictConfig type tags are touched) ---
    if "omegaconf" not in sys.modules:
        oc = _mkmod("omegaconf")

        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def to_container(x, **k):
                return x

        oc.ListConfig = ListConfig
        oc.DictConfig = DictConfig
        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc

    # --- torchvision (save_image / transforms are never hit in these tests) ---
    if "torchvision" not in sys.modules:
        tv = _mkmod("torchvision")
        tv_utils = _mkmod("torchvision.utils")
        tv_utils.save_image = lambda *a, **k: None
        tv_transforms = _mkmod("torchvision.transforms")

        class _Noop:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        class InterpolationMode:
            BICUBIC = "bicubic"
            BILINEAR = "bilinear"

        for n in ("Compose", "Resize", "Normalize", "Grayscale", "ToTensor"):
            setattr(tv_transforms, n, _Noop)
        tv_transforms.InterpolationMode = InterpolationMode

        # functional torchvision.models.resnet.BasicBlock (used by TRBA)
        tv_models = _mkmod("torchvision.models")
        tv_resnet = _mkmod("torchvision.models.resnet")

        def conv3x3(inp, out, stride=1):
            return torch.nn.Conv2d(inp, out, 3, stride, 1, bias=False)

        def conv1x1(inp, out, stride=1):
            return torch.nn.Conv2d(inp, out, 1, stride, bias=False)

        class BasicBlock(torch.nn.Module):
            expansion = 1

            def __init__(self, inplanes, planes, stride=1, downsample=None,
                         groups=1, base_width=64, dilation=1, norm_layer=None, **kw):
                super().__init__()
                self.conv1 = conv3x3(inplanes, planes, stride)
                self.bn1 = torch.nn.BatchNorm2d(planes)
                self.relu = torch.nn.ReLU(inplace=True)
                self.conv2 = conv3x3(planes, planes)
                self.bn2 = torch.nn.BatchNorm2d(planes)
                self.downsample = downsample
                self.stride = stride

            def forward(self, x):
                identity = x
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                if self.downsample is not None:
                    identity = self.downsample(x)
                return self.relu(out + identity)

        tv_resnet.BasicBlock = BasicBlock
        tv_resnet.conv1x1 = conv1x1
        tv_resnet.conv3x3 = conv3x3
        tv_models.resnet = tv_resnet
        tv.models = tv_models
        tv.utils = tv_utils
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
        sys.modules["torchvision.transforms"] = tv_transforms
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models.resnet"] = tv_resnet

    # --- timm (functional mini-ViT with timm naming; see timm_stub.py) ---
    sys.path.insert(0, str(Path(__file__).parent))
    import timm_stub

    timm = _mkmod("timm")
    timm_models = _mkmod("timm.models")
    timm_vit = _mkmod("timm.models.vision_transformer")
    timm_helpers = _mkmod("timm.models.helpers")
    timm_optim = _mkmod("timm.optim")

    timm_vit.VisionTransformer = timm_stub.VisionTransformer
    timm_vit.PatchEmbed = timm_stub.PatchEmbed
    timm_helpers.named_apply = timm_stub.named_apply
    timm_optim.create_optimizer_v2 = lambda *a, **k: None
    timm_optim_factory = _mkmod("timm.optim.optim_factory")
    timm_optim_factory.param_groups_weight_decay = lambda *a, **k: []
    timm_optim.optim_factory = timm_optim_factory
    sys.modules["timm.optim.optim_factory"] = timm_optim_factory
    timm_models.vision_transformer = timm_vit
    timm_models.helpers = timm_helpers
    timm.models = timm_models
    timm.optim = timm_optim
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.vision_transformer"] = timm_vit
    sys.modules["timm.models.helpers"] = timm_helpers
    sys.modules["timm.optim"] = timm_optim

    # pytorch_lightning.utilities.types (imported by strhub base/system)
    pl_utils = _mkmod("pytorch_lightning.utilities")
    pl_types = _mkmod("pytorch_lightning.utilities.types")
    pl_types.STEP_OUTPUT = object
    pl_utils.types = pl_types
    sys.modules["pytorch_lightning.utilities"] = pl_utils
    sys.modules["pytorch_lightning.utilities.types"] = pl_types

    if str(REFERENCE / "src" / "parseq") not in sys.path:
        sys.path.insert(0, str(REFERENCE / "src" / "parseq"))

    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _installed = True
