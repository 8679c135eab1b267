"""Generic helpers: reflection registry, attribute dict, timers.

Mirrors the helper surface of the reference `src/utils.py` (utils.py:18-196)
without any torch dependency.
"""
from __future__ import annotations

import time
from collections import OrderedDict
from inspect import isclass

from masterthesis_tpu.utils.images import (  # noqa: F401
    make_grid,
    save_image,
    save_images,
    tensor_to_image,
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


class AttributeDict(OrderedDict):
    """OrderedDict with attribute access (reference utils.py:122-148)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if isinstance(arg, dict):
                for k, v in arg.items():
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return self.get(attr)

    def __setattr__(self, key, value):
        self.__setitem__(key, value)

    def __delattr__(self, item):
        self.__delitem__(item)


class TimerBlock:
    """Context manager printing elapsed-time-prefixed log lines
    (reference utils.py:150-173)."""

    def __init__(self, title):
        print(str(title))
        self.start = time.perf_counter()

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.end = time.perf_counter()
        self.interval = self.end - self.start
        if exc_type is not None:
            self.log("Operation failed\n")
        else:
            self.log("Operation finished\n")

    def log(self, string):
        duration = time.perf_counter() - self.start
        units = "s"
        if duration > 60:
            duration = duration / 60.0
            units = "m"
        print("  [{:.3f}{}] {}".format(duration, units, string), flush=True)


class AverageMeter:
    """Running average tracker (reference utils.py:175-196)."""

    def __init__(self, name, fmt=":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)
