"""S1-S4 raw-file ingestion parity: enumeration, whitelist, artifact
exclusion, duplicate-basename dedup — against a staged directory tree
shaped like the reference's test corpus."""

import os
import shutil
import tempfile

import pytest

from handprint_spark.kernels import codec
from handprint_spark.sources.binary_ingest import enumerate_targets, read_binary_dir


@pytest.fixture()
def staged_dir():
    d = tempfile.mkdtemp(prefix="hp_ingest_")
    sub = os.path.join(d, "nested")
    os.makedirs(sub)

    def put(name, content=b"x"):
        with open(os.path.join(d if "/" not in name else sub, os.path.basename(name)), "wb") as f:
            f.write(content)

    put("page1.png", codec.encode_media("page one"))
    put("page1.tif", codec.encode_media("page one tif"))  # S4: loses to .png
    put("page1.jpg", codec.encode_media("page one jpg"))  # S4: loses to .png
    put("page2.jpg", codec.encode_media("page two"))
    put("page4.jpg", codec.encode_media("page four jpg"))  # no png sibling:
    put("page4.tif", codec.encode_media("page four tif"))  # ...BOTH kept
    put("nested/page3.jp2", codec.encode_media("page three"))  # recursive lookup
    put("nested/page1.tif", codec.encode_media("other dir"))  # png in OTHER dir: kept
    put("notes.txt", b"not an image")  # S2: rejected extension
    put("page1.handprint-google.png", b"artifact")  # S3: artifact
    put("empty.png", b"")  # S7: zero-length
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_enumeration_rules(spark, staged_dir):
    files = read_binary_dir(spark, staged_dir)
    targets = enumerate_targets(files)
    rows = [((r.path.split("/")[-2]), r.file_name, r) for r in targets.collect()]
    kept = {(d, n) for d, n, _ in rows}
    # reference rule (main_body.py:171-180): only a same-directory .png
    # sibling shadows other formats; page4.{jpg,tif} both survive
    assert kept == {
        (kept_dir, name)
        for kept_dir, name in [
            ("nested", "page3.jp2"), ("nested", "page1.tif"),
        ]
    } | {(d, n) for d, n in [
        (staged_dir.rstrip("/").split("/")[-1], x)
        for x in ("page1.png", "page2.jpg", "page4.jpg", "page4.tif")
    ]}
    # the kept root page1 is the canonical-format one, with its own bytes
    by_name = {(d, n): r for d, n, r in rows}
    root = staged_dir.rstrip("/").split("/")[-1]
    assert codec.decode_media(bytes(by_name[(root, "page1.png")].content)).text == "page one"


def test_scan_sees_all_then_filters(spark, staged_dir):
    all_files = read_binary_dir(spark, staged_dir)
    # the binaryFile source drops zero-length files at listing time, so
    # the S7 guard fires before any predicate: 11 staged, 10 listed
    assert all_files.count() == 10
    assert enumerate_targets(all_files).count() == 6
