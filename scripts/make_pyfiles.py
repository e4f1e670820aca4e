"""Build the ``--py-files`` artifact for cluster submission.

The north-star run mode is ``spark-submit --py-files translink.zip`` on a
multi-executor cluster; this script produces that zip. The archive is
DETERMINISTIC (sorted member order, fixed timestamps, no .pyc/__pycache__),
so its sha256 is a stable lineage id for "which engine build produced this
run" — the same role the content fingerprint plays for inputs
(translink/catalog.py:input_content_fingerprint).

Usage::

    python scripts/make_pyfiles.py [--out dist/translink.zip]

Then::

    spark-submit --master <cluster> --deploy-mode cluster \
        --py-files dist/translink.zip scripts/submit_job.py \
        --input s3://.../transcripts --workdir s3://.../work ...
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: zip epoch for reproducible builds (1980-01-01, the zip format's minimum)
_FIXED_DATE = (1980, 1, 1, 0, 0, 0)


def build(out_path: str, repo_root: str = REPO_ROOT) -> str:
    """Write the package zip; return its sha256 hex digest."""
    pkg_dir = os.path.join(repo_root, "translink")
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            arcname = os.path.relpath(full, repo_root)
            members.append((full, arcname))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arcname in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    with open(out_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default=os.path.join(REPO_ROOT, "dist", "translink.zip"))
    args = p.parse_args(argv)
    digest = build(args.out)
    print(f"{args.out} sha256={digest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
