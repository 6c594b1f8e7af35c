"""Dataset fixtures ported from the reference test suite.

Deterministic generators and seeded random draws per
/root/reference/spec/support/test_dataset.rb (formulas) and FIXTURES.md §2.
The reference embeds frozen NumPy draws; we regenerate with
``np.random.default_rng(42)`` — the asserted property is the accuracy
*bound*, which holds for any draw.

Oracle quantile: ``sorted(data)[int(q * (n - 1))]`` (test_dataset.rb:37-41).
"""

from __future__ import annotations

import math

import numpy as np


def exact_quantile(data, q: float) -> float:
    s = sorted(data)
    return float(s[int(q * (len(s) - 1))])


def uniform_forward(size: int) -> list[float]:
    return [float(i) for i in range(size)]


def uniform_backward(size: int) -> list[float]:
    return [float(size - i) for i in range(size)]


def negative_uniform_forward(size: int) -> list[float]:
    return [float(i - size) for i in range(size)]


def negative_uniform_backward(size: int) -> list[float]:
    return [float(-i) for i in range(size)]


def number_line_forward(size: int) -> list[float]:
    return [float(x) for x in range(-size // 2 + 1, size // 2 + 1)]


def number_line_backward(size: int) -> list[float]:
    return list(reversed(number_line_forward(size)))


def uniform_zoom_in(size: int) -> list[float]:
    arr: list[float] = []
    for item in range(size // 2):
        arr.append(float(item))
        arr.append(float(size - item - 1))
    if size % 2:
        arr.append(float(size // 2))
    return arr


def uniform_zoom_out(size: int) -> list[float]:
    arr: list[float] = []
    if size % 2:
        half = size // 2
        arr.append(float(half))
        for item in range(1, half + 1):
            arr.append(float(half + item))
            arr.append(float(half - item))
    else:
        half = math.ceil(size / 2.0)
        for item in range(half):
            arr.append(float(half + item))
            arr.append(float(half - item - 1))
    return arr


def uniform_sqrt(size: int) -> list[float]:
    arr: list[float] = []
    t = math.sqrt(2.0 * size)
    initial_item = 0
    initial_skip = 1
    emitted = 0
    i = 0
    while emitted < size:
        item = initial_item
        skip = initial_skip
        steps = math.ceil(t - i)
        for _ in range(steps):
            if item < size:
                arr.append(float(item))
                emitted += 1
            item += skip
            skip += 1
        if t - i > 1:
            initial_skip += 1
            initial_item += initial_skip
            i += 1
        else:
            initial_item += 1
    return arr


def constant(size: int) -> list[float]:
    return [42.0] * size


def _rng() -> np.random.Generator:
    return np.random.default_rng(42)


def exponential(n: int = 1000) -> list[float]:
    return _rng().exponential(scale=0.01, size=n).tolist()


def lognormal(n: int = 1000) -> list[float]:
    return (_rng().lognormal(size=n) / 100.0).tolist()


def normal(size: int, loc: float = 37.4, scale: float = 1.0) -> list[float]:
    return _rng().normal(loc, scale, size).tolist()


def bimodal(n: int = 1000) -> list[float]:
    r = _rng()
    left = r.laplace(loc=17.3, scale=1.0, size=n // 2)
    right = r.normal(loc=-2.0, scale=3.0, size=n - n // 2)
    out = np.concatenate([left, right])
    r.shuffle(out)
    return out.tolist()


def mixed(n: int = 1000) -> list[float]:
    r = _rng()
    k = int(0.9 * n)
    a = r.lognormal(0.0, 0.25, size=k) * 0.1
    b = r.normal(10.0, 1.0, size=n - k)
    out = np.concatenate([a, b])
    r.shuffle(out)
    return out.tolist()


def trimodal(n: int = 999) -> list[float]:
    r = _rng()
    third = n // 3
    a = r.laplace(loc=17.3, scale=1.0, size=third)
    b = r.normal(5.0, 0.5, size=third)
    c = r.exponential(scale=0.01, size=n - 2 * third)
    out = np.concatenate([a, b, c])
    r.shuffle(out)
    return out.tolist()


def laplace(n: int = 1000) -> list[float]:
    return _rng().laplace(loc=11300.0, scale=1.0, size=n).tolist()


def integers(n: int = 1000) -> list[float]:
    return [float(round(v)) for v in _rng().normal(4.3, 5.0, size=n)]


DETERMINISTIC = {
    "UniformForward": uniform_forward,
    "UniformBackward": uniform_backward,
    "UniformZoomIn": uniform_zoom_in,
    "UniformZoomOut": uniform_zoom_out,
    "UniformSqrt": uniform_sqrt,
    "Constant": constant,
    "NegativeUniformBackward": negative_uniform_backward,
    "NegativeUniformForward": negative_uniform_forward,
    "NumberLineBackward": number_line_backward,
    "NumberLineForward": number_line_forward,
}

FROZEN = {
    "Exponential": exponential,
    "Lognormal": lognormal,
    "Bimodal": bimodal,
    "Mixed": mixed,
    "Trimodal": trimodal,
}
