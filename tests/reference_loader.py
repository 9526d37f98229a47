"""Load the READ-ONLY reference PyTorch modules for parity testing.

We never copy reference code into this repo; for golden tests we import the
reference modules in-place (with their tiny external helpers stubbed) and
compare our flax models' outputs against theirs on random weights.
"""
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference"


def _stub_inpainting_utils():
    """models.py imports `from Inpainting.hifi_gan.utils import init_weights,
    get_padding` — provide those two trivial helpers under the expected name."""
    if "Inpainting.hifi_gan.utils" in sys.modules:
        return
    pkg = types.ModuleType("Inpainting")
    sub = types.ModuleType("Inpainting.hifi_gan")
    utils = types.ModuleType("Inpainting.hifi_gan.utils")

    def init_weights(m, mean=0.0, std=0.01):
        if "Conv" in m.__class__.__name__:
            m.weight.data.normal_(mean, std)

    def get_padding(kernel_size, dilation=1):
        return int((kernel_size * dilation - dilation) / 2)

    utils.init_weights = init_weights
    utils.get_padding = get_padding
    sys.modules["Inpainting"] = pkg
    sys.modules["Inpainting.hifi_gan"] = sub
    sys.modules["Inpainting.hifi_gan.utils"] = utils


def load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_hifigan_models():
    _stub_inpainting_utils()
    return load_module(f"{REF}/I_ea/hifi_gan/models.py", "ref_hifigan_models")


def ref_ida_modules():
    """Load the I_da reference modules, bypassing the repo's broken
    src/modules/__init__.py (it imports files that don't exist upstream).
    Registers each under its canonical 'src.*' name so intra-repo imports
    resolve. Returns (models, jukebox, vq, model)."""
    if getattr(ref_ida_modules, "_cache", None):
        return ref_ida_modules._cache
    # stub optional host-only deps the reference imports at module scope
    for name in ("kaldi_io", "fairseq", "soundfile", "librosa", "torchaudio",
                 "amfm_decompy", "amfm_decompy.pYAAPT",
                 "amfm_decompy.basic_tools"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if not getattr(torch.Tensor.cuda, "_patched", False):
        def _cpu(self, *a, **k):
            return self
        _cpu._patched = True
        torch.Tensor.cuda = _cpu
    _stub_ida_dist()
    # utils imports HubertFeatureReader (fairseq-based) at module scope;
    # stub the class — the parity tests never touch it
    hfr = types.ModuleType("src.hubert_feature_reader")
    hfr.HubertFeatureReader = object
    sys.modules["src.hubert_feature_reader"] = hfr
    utils = load_module(f"{REF}/I_da/src/utils.py", "src.utils")
    sys.modules["src"].utils = utils
    resnet = load_module(f"{REF}/I_da/src/modules/resnet.py",
                         "src.modules.resnet")
    sys.modules["src.modules"].resnet = resnet
    vq = load_module(f"{REF}/I_da/src/modules/vq.py", "src.modules.vq")
    sys.modules["src.modules"].vq = vq
    jukebox = load_module(f"{REF}/I_da/src/modules/jukebox.py",
                          "src.modules.jukebox")
    sys.modules["src.modules"].jukebox = jukebox
    models = load_module(f"{REF}/I_da/src/models.py", "src.models")
    sys.modules["src"].models = models
    model = load_module(f"{REF}/I_da/src/model.py", "src.model")
    ref_ida_modules._cache = (models, jukebox, vq, model)
    return ref_ida_modules._cache


def _stub_ida_dist():
    """vq.py does `import src.modules.dist as dist`; provide the no-op
    single-process fallback (the shim itself no-ops when torch.distributed is
    uninitialized, so identical semantics)."""
    if "src.modules.dist" in sys.modules:
        return
    pkg = sys.modules.setdefault("src", types.ModuleType("src"))
    mods = sys.modules.setdefault("src.modules", types.ModuleType("src.modules"))
    pkg.modules = mods
    dist = types.ModuleType("src.modules.dist")
    dist.broadcast = lambda *a, **k: None
    dist.all_reduce = lambda *a, **k: None
    dist.all_gather = lambda *a, **k: None
    dist.barrier = lambda *a, **k: None
    sys.modules["src.modules.dist"] = dist
    mods.dist = dist


def ref_vq():
    """Reference VQ module with `.cuda()` no-op'd (no GPU in the sandbox;
    BottleneckBlock.reset_k constructs buffers with .cuda())."""
    if not getattr(torch.Tensor.cuda, "_patched", False):
        def _cpu(self, *a, **k):
            return self
        _cpu._patched = True
        torch.Tensor.cuda = _cpu
    _stub_ida_dist()
    return load_module(f"{REF}/I_da/src/modules/vq.py", "ref_ida_vq")


class AttrDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.__dict__ = self


def seed_all(seed=1234):
    torch.manual_seed(seed)
    np.random.seed(seed)
