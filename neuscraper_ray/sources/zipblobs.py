"""Zip-of-blobs source (S3 parity: ClueWeb22 VDOM zip reader shape).

The reference iterates ``.zip`` archives of per-page protobuf blobs and
``AnnotateHtml.ParseFromString``s each member
(``/root/reference/src/build_test.py:193-199``). The SOURCE is
generic — one task per zip file, each member's bytes handed to a
caller-supplied decoder ``bytes -> dict`` — and the ClueWeb decoder is
``protowire.decode_annotate_html``, a stdlib protobuf wire-format
implementation of the ``AnnotateHtml`` schema (no proto lib in this
environment; see ``sources/protowire.py``). The plumbing —
``read_binary_files`` fan-out, in-memory member iteration, per-member
error policy (skip + count) — matches the reference's bare-except
member skip.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Callable

import pyarrow as pa

import ray.data


def read_zip_blobs(
    paths: str | list[str],
    decoder: Callable[[str, bytes], dict],
    schema: pa.Schema,
) -> ray.data.Dataset:
    """Zip archives -> Dataset of decoded member rows.

    ``decoder(member_name, payload) -> dict`` (column -> value) or
    raises to skip the member (reference behavior: bad members are
    dropped; we count them in a ``_decode_errors`` column of an
    otherwise-normal row? no — they are skipped, matching the
    reference's bare-except, but the skip is LOGGED per task).
    """
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        skipped = 0
        for payload in batch.column("bytes").to_pylist():
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for name in zf.namelist():
                    try:
                        rows.append(decoder(name, zf.read(name)))
                    except Exception:
                        skipped += 1
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "read_zip_blobs: skipped %d undecodable members", skipped
            )
        if not rows:
            return pa.table({f.name: pa.array([], f.type) for f in schema})
        cols = {
            f.name: pa.array([r.get(f.name) for r in rows], f.type) for f in schema
        }
        return pa.table(cols)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_zip_blobs(path: str, members: list[tuple[str, bytes]]) -> None:
    """Test-support writer: one zip of named blobs."""
    with zipfile.ZipFile(path, "w") as zf:
        for name, payload in members:
            zf.writestr(name, payload)
