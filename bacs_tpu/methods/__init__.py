"""Continual-learning method plugins (the reference's `loss/` layer).

Each method is a pure loss module over the shared forward contract plus
host-level task-boundary hooks (`begin_task`/`end_task`); selected by the
config registry from reference `_target_` strings
(reference: conf/*/loss/*.yaml, loss/__init__.py).
"""

from bacs_tpu.methods.base import Method, ModelContext, StepAux  # noqa: F401
from bacs_tpu.methods.ce import CrossEntropyMethod  # noqa: F401
from bacs_tpu.methods.mib import MiBMethod  # noqa: F401
from bacs_tpu.methods.plop import PlopMethod  # noqa: F401
from bacs_tpu.methods.prototypes import PrototypesMethod  # noqa: F401
from bacs_tpu.methods.icarl import IcarlMethod  # noqa: F401
from bacs_tpu.methods.er import ExperienceReplayMethod  # noqa: F401
from bacs_tpu.methods.sdr import SDRMethod  # noqa: F401
from bacs_tpu.methods.bacs import BACSMethod  # noqa: F401


_METHODS = {
    "loss.crossentropy": CrossEntropyMethod,
    "crossentropy": CrossEntropyMethod,
    "loss.mib": MiBMethod,
    "mib": MiBMethod,
    "loss.ploploss": PlopMethod,
    "plop": PlopMethod,
    "ploploss": PlopMethod,
    "loss.prototypes": PrototypesMethod,
    "prototypes": PrototypesMethod,
    "loss.icarlloss": IcarlMethod,
    "icarl": IcarlMethod,
    "icarlloss": IcarlMethod,
    "loss.experiencereplay": ExperienceReplayMethod,
    "experiencereplay": ExperienceReplayMethod,
    "er": ExperienceReplayMethod,
    "loss.sdr": SDRMethod,
    "sdr": SDRMethod,
    "loss.bacsloss": BACSMethod,
    "bacs": BACSMethod,
    "bacsloss": BACSMethod,
}


def create_method(target: str, **kwargs) -> Method:
    key = target.lower().replace("_", "")
    if key not in _METHODS:
        key = key.rsplit(".", 1)[-1]
    if key not in _METHODS:
        raise ValueError(f"unknown loss/method {target!r}")
    return _METHODS[key](**kwargs)
