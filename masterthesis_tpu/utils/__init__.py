"""Generic helpers: reflection registry, attribute dict.

Covers the helper surface of the reference `src/utils.py` (utils.py:18-196)
without any torch dependency; the timing/metering helpers live with the rest
of the instrumentation in utils/profiling.py and are re-exported here.
"""
from __future__ import annotations

from inspect import isclass

from masterthesis_tpu.utils.images import (  # noqa: F401
    make_grid,
    save_image,
    save_images,
    tensor_to_image,
)
from masterthesis_tpu.utils.profiling import (  # noqa: F401
    AverageMeter,
    TimerBlock,
)


def get_modules(module, superclass=None, filter=None):
    """List class names defined in ``module`` (reference utils.py:18-27)."""
    if superclass:
        modules = [
            x
            for x in dir(module)
            if isclass(getattr(module, x)) and issubclass(getattr(module, x), superclass)
        ]
    else:
        modules = [x for x in dir(module) if isclass(getattr(module, x))]
    if filter:
        modules = [m for m in modules if filter in m]
    return modules


def module_to_dict(module, exclude=()):
    """Map class-name -> class for every class in ``module`` (utils.py:29-32)."""
    return dict(
        (x, getattr(module, x))
        for x in dir(module)
        if x not in exclude and isclass(getattr(module, x)) and getattr(module, x) not in exclude
    )


class AttributeDict(dict):
    """dict with attribute-style access; missing attributes read as None
    (argument namespaces probe optional flags with plain ``args.flag``).
    Role of reference utils.py:122-148."""

    def __getattr__(self, name):
        if name.startswith("__"):  # keep pickling/copy protocols sane
            raise AttributeError(name)
        return self.get(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]
