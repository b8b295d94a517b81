"""Format + resize-math kernels vs the reference's exact goldens.

The dimension goldens are the reference's own unit-test anchors
(/root/reference/tests/test_images.py): f1.png is 15553 bytes at
340x106, and the asserted post-resize dimensions are pure round()
arithmetic — verified here without any image library.
"""

from handprint_spark.kernels.formats import (
    ACCEPTED_FORMATS,
    canonical_format_name,
    fold_limits,
    needs_dimension_reduce,
    reduced_dimension_dims,
    reduced_size_dims,
)


def test_canonical_format_name():
    # reference tests/test_images.py:20-23
    assert canonical_format_name("jpg") == "jpeg"
    assert canonical_format_name("jpeg") == "jpeg"
    assert canonical_format_name("TIF") == "tiff"
    assert canonical_format_name("tiff") == "tiff"
    assert canonical_format_name("PNG") == "png"
    assert canonical_format_name("jp2") == "jp2"


def test_accepted_formats():
    # reference services/__init__.py:21-22
    assert set(ACCEPTED_FORMATS) == {
        "jpg", "jpeg", "jp2", "pdf", "png", "gif", "bmp", "tif", "tiff"
    }


def test_reduced_size_dims_golden():
    # reference tests/test_images.py:40-43: f1.png (340x106, 15553 B)
    # reduced to max_size=1000 -> (22, 7)
    assert reduced_size_dims(340, 106, 15553, 1000) == (22, 7)
    # already under the cap -> unchanged
    assert reduced_size_dims(340, 106, 900, 1000) == (340, 106)


def test_reduced_dimension_dims_golden():
    # reference tests/test_images.py:51-54: f1.png fit in 100x100 -> (100, 31)
    assert reduced_dimension_dims(340, 106, 100, 100) == (100, 31)


def test_needs_dimension_reduce_guard():
    # reference manager.py:360-361
    assert needs_dimension_reduce(10001, 50, 10000, 10000)
    assert needs_dimension_reduce(50, 10001, 10000, 10000)
    assert not needs_dimension_reduce(10000, 10000, 10000, 10000)


def test_fold_limits():
    # reference manager.py:104-123 min-fold
    size, dims = fold_limits(["amazon-textract", "google", "microsoft"])
    assert size == 4 * 1024 * 1024
    assert dims == (10000, 10000)
    size, dims = fold_limits(["google"])
    assert size == 10 * 1024 * 1024
    assert dims is None
    size, dims = fold_limits(["amazon-textract", "google"])
    assert size == 10 * 1024 * 1024 and dims is None


def test_fold_limits_unknown_service_is_value_error():
    import pytest

    from handprint_spark.kernels.formats import fold_limits

    with pytest.raises(ValueError, match="unknown service 'Amazon'"):
        fold_limits(["Amazon"])
