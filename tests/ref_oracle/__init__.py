"""Test oracle: import the reference PyTorch implementation (read-only at
/root/reference) with lightweight stubs for its missing heavy dependencies,
so tests can compare our JAX forward passes against reference activations
computed from the SAME randomly-initialised weights.

This package only feeds tests; the framework itself never imports it.
"""

import importlib
import sys
import types

REF_SRC = "/root/reference/vitlens/src"

_INSTALLED = False


class _EasyDict(dict):
    """Minimal easydict.EasyDict stand-in (attr <-> item access)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _stub_module(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install():
    """Install stubs + a namespace 'open_clip' package whose submodules load
    from the reference tree WITHOUT executing open_clip/__init__.py (which
    pulls torchvision/timm/ftfy)."""
    global _INSTALLED
    if _INSTALLED:
        return
    import torch
    import torch.nn as nn

    # easydict
    _stub_module("easydict", EasyDict=_EasyDict)

    # omegaconf (only OmegaConf.create used by processors' from_config)
    class _OmegaConf:
        @staticmethod
        def create(d=None):
            return _EasyDict(d or {})

    _stub_module("omegaconf", OmegaConf=_OmegaConf)

    # torchvision bits referenced by open_clip.utils / transform
    tv = _stub_module("torchvision")
    tv_transforms = _stub_module("torchvision.transforms")
    tv.transforms = tv_transforms
    for cls in ["Normalize", "Compose", "RandomResizedCrop", "InterpolationMode",
                "ToTensor", "Resize", "CenterCrop", "ColorJitter", "Grayscale"]:
        setattr(tv_transforms, cls, type(cls, (), {}))
    tv_transforms.functional = _stub_module("torchvision.transforms.functional")
    tv_ops = _stub_module("torchvision.ops")
    tv.ops = tv_ops
    tv_ops_misc = _stub_module("torchvision.ops.misc",
                               FrozenBatchNorm2d=nn.BatchNorm2d)
    tv_ops.misc = tv_ops_misc

    # timm bits (DropPath used with drop_prob=0 in eval paths)
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm = _stub_module("timm")
    timm_models = _stub_module("timm.models")
    timm.models = timm_models
    timm_models.hub = _stub_module("timm.models.hub")
    timm_models.layers = _stub_module(
        "timm.models.layers", DropPath=DropPath,
        drop_path=lambda x, p=0.0, training=False: x,
        to_2tuple=_to_2tuple, trunc_normal_=_trunc_normal_)
    timm_models.registry = _stub_module(
        "timm.models.registry", register_model=lambda f: f)
    timm_models.layers.Mlp = type("Mlp", (nn.Module,), {})
    timm.layers = _stub_module(
        "timm.layers",
        RotAttentionPool2d=type("RotAttentionPool2d", (nn.Module,), {}),
        AttentionPool2d=type("AttentionPool2d", (nn.Module,), {}))

    # dgl (FPS falls back to pure torch when the call raises)
    class _NoDGL:
        @staticmethod
        def farthest_point_sampler(*a, **k):
            raise RuntimeError("dgl stub: use torch fallback")

    dgl = _stub_module("dgl")
    dgl.geometry = _stub_module("dgl.geometry",
                                farthest_point_sampler=_NoDGL.farthest_point_sampler)

    # torch_redstone: Lambda + the bits the OpenShape baselines use.
    class _Lambda(nn.Module):
        def __init__(self, fn):
            super().__init__()
            self.fn = fn

        def forward(self, x):
            return self.fn(x)

    def _supercat(tensors, dim=-1):
        """torch_redstone.supercat: broadcast-then-concatenate. Every tensor
        is left-padded to the max ndim and expanded to the common broadcast
        shape in all axes except `dim` (ppat.py:105-106 usage: prepend a
        cls token / a zero centroid column)."""
        nd = max(t.dim() for t in tensors)
        shaped = [t.reshape((1,) * (nd - t.dim()) + tuple(t.shape))
                  for t in tensors]
        axis = dim if dim >= 0 else nd + dim
        target = [1] * nd
        for t in shaped:
            for a in range(nd):
                if a != axis:
                    target[a] = max(target[a], t.shape[a])
        out = []
        for t in shaped:
            shape = list(target)
            shape[axis] = t.shape[axis]
            out.append(t.expand(*shape))
        return torch.cat(out, dim=axis)

    class _Polyfill:
        @staticmethod
        def cdist2(x, y):
            """Squared pairwise distances, NEGATED: dgcnn.py:11 does
            `cdist2(x, x).topk(k)` (largest=True), and the kNN graph must
            select NEAREST neighbours (DGCNN paper; OpenShape's published
            DGCNN baselines), so cdist2's sign convention must make topk
            return nearest."""
            x2 = (x ** 2).sum(-1, keepdim=True)
            y2 = (y ** 2).sum(-1, keepdim=True)
            d2 = x2 + y2.transpose(-1, -2) - 2 * torch.matmul(
                x, y.transpose(-1, -2))
            return -d2

    _stub_module("torch_redstone", Lambda=_Lambda, supercat=_supercat,
                 Polyfill=_Polyfill)

    # namespace package pointing at the reference tree
    pkg = types.ModuleType("open_clip")
    pkg.__path__ = [f"{REF_SRC}/open_clip"]
    sys.modules["open_clip"] = pkg

    _INSTALLED = True


def load(modname: str):
    """Import e.g. 'open_clip.transformer' from the reference tree."""
    install()
    return importlib.import_module(modname)


def load_file(relpath: str):
    """Load ONE reference module by file path (relative to REF_SRC), without
    executing any package __init__ along the way. Needed for leaf modules
    whose package __init__ pulls unstubable deps (e.g.
    open_clip/modal_video/processors/__init__.py imports vt_processors ->
    decord + skimage). The module is registered under a synthetic name."""
    import importlib.util

    install()
    name = "refleaf_" + relpath.replace("/", "_").removesuffix(".py")
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF_SRC}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    import warnings

    with warnings.catch_warnings():
        # the reference's own source has invalid escape sequences (e.g.
        # randaugment.py "\d"); its compile-time warnings are not ours
        warnings.simplefilter("ignore", SyntaxWarning)
        spec.loader.exec_module(mod)
    return mod


OPENSHAPE_MODELS = "/root/reference/VitLens-OpenShape/src/models"


def load_openshape_model(modname: str):
    """Import e.g. 'ppat' or 'dgcnn' from the reference OpenShape models
    tree (relative imports like `.pointnet_util` resolve inside it)."""
    install()
    if "os_models" not in sys.modules:
        pkg = types.ModuleType("os_models")
        pkg.__path__ = [OPENSHAPE_MODELS]
        sys.modules["os_models"] = pkg
    return importlib.import_module(f"os_models.{modname}")


def easydict(**kwargs):
    install()
    return _EasyDict(kwargs)
