"""Format canonicalization, accepted-format whitelist, service limits,
and the pure resize arithmetic of the reference's image-normalization
chain.

All of the reference's exact-dimension goldens
(reference tests/test_images.py: reduced_image_size -> (22, 7),
reduced_image_dimensions -> (100, 31)) are pure ``round()`` math over
(width, height, byte-size, caps) — no image library needed — so the
math lives here and the pixel resampling lives in codec.py.

Python's ``round()`` is banker's rounding (round-half-to-even), which
differs from Spark's ROUND (HALF_UP); per SURVEY.md §7 "hard parts" the
coordinate/dimension math therefore stays in Python inside the UDFs,
never re-expressed as Catalyst ROUND.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

# Reference services/__init__.py:21-22.
ACCEPTED_FORMATS = ("jpg", "jpeg", "jp2", "pdf", "png", "gif", "bmp", "tif", "tiff")

OUTPUT_FORMAT = "png"  # reference manager.py normalizes everything to PNG


class ServiceLimits(NamedTuple):
    service: str
    max_rate: float
    max_size: int
    max_width: Optional[int]
    max_height: Optional[int]


# Constants from reference amazon.py:47-63, google.py:66-85, microsoft.py:62-80.
SERVICE_LIMITS = [
    ServiceLimits("amazon-rekognition", 0.25, 10 * 1024 * 1024, None, None),
    ServiceLimits("amazon-textract", 0.25, 10 * 1024 * 1024, None, None),
    ServiceLimits("google", 30.0, 10 * 1024 * 1024, None, None),
    ServiceLimits("microsoft", 0.333, 4 * 1024 * 1024, 10000, 10000),
]

KNOWN_SERVICES = tuple(s.service for s in SERVICE_LIMITS)


def canonical_format_name(fmt: str) -> str:
    """jpg->jpeg, tif->tiff, lowercase (reference images.py:104-112)."""
    fmt = fmt.lower()
    if fmt in ("jpg", "jpeg"):
        return "jpeg"
    if fmt in ("tiff", "tif"):
        return "tiff"
    return fmt


def fold_limits(services: list[str]) -> tuple[Optional[int], Optional[tuple[int, int]]]:
    """Min-fold of per-service limits over the selected services
    (reference manager.py:104-123): global max_size = min of the
    non-null max_sizes; global max_dimensions = elementwise min of the
    non-null dimension pairs; None when no service constrains it."""
    max_size: Optional[int] = None
    max_dims: Optional[tuple[int, int]] = None
    by_name = {s.service: s for s in SERVICE_LIMITS}
    for name in services:
        if name not in by_name:
            # validate up front like the reference manager — a bare
            # KeyError from a typo'd -s value names neither the bad
            # input nor the valid choices
            raise ValueError(
                f"unknown service {name!r} (known: {', '.join(sorted(by_name))})"
            )
        s = by_name[name]
        if s.max_size:
            max_size = s.max_size if max_size is None else min(max_size, s.max_size)
        if s.max_width is not None and s.max_height is not None:
            if max_dims is None:
                max_dims = (s.max_width, s.max_height)
            else:
                max_dims = (min(max_dims[0], s.max_width), min(max_dims[1], s.max_height))
    return max_size, max_dims


def reduced_size_dims(width: int, height: int, byte_size: int, max_size: int) -> tuple[int, int]:
    """New dimensions when shrinking to a byte cap
    (reference images.py:149-157): ratio = max_size/current_bytes,
    each dim ``round(dim * ratio)`` with Python banker's rounding.
    Returns the original dims when already within the cap."""
    if byte_size <= max_size:
        return (width, height)
    ratio = max_size / byte_size
    return (round(width * ratio), round(height * ratio))


def reduced_dimension_dims(
    width: int, height: int, max_width: int, max_height: int
) -> tuple[int, int]:
    """Fit-within-dimensions math (reference images.py:179-185):
    ratio = min(max_w/w, max_h/h), each dim ``round(dim * ratio)``.
    Note the reference applies this even when the image is already
    within bounds (ratio > 1 upscales); callers guard with
    ``needs_dimension_reduce`` as manager.py:357-362 does."""
    ratio = min(max_width / width, max_height / height)
    return (round(width * ratio), round(height * ratio))


def needs_dimension_reduce(width: int, height: int, max_width: int, max_height: int) -> bool:
    """Guard from reference manager.py:360-361."""
    return max_width < width or max_height < height
