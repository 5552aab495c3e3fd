"""spark-submit packaging helper (north rule: "launched with spark-submit
--py-files on multi-executor clusters").

``python -m palimpzest_spark.submit --zip OUT.zip`` builds the ``--py-files``
archive; the printed command is the cluster launch line. Local mode needs
none of this (the package is importable from the repo), but executors on a
real cluster receive code only via the archive.
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build_pyfiles_zip(out_path: str, package_root: str | None = None) -> str:
    root = package_root or os.path.dirname(os.path.abspath(__file__))
    base = os.path.dirname(root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, base))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--zip", default="palimpzest_spark.zip")
    args = ap.parse_args()
    path = build_pyfiles_zip(args.zip)
    print(f"built {path}")
    print(
        "launch (N executors):\n"
        f"  spark-submit --master <cluster> --num-executors <N> "
        f"--py-files {path} -m palimpzest_spark.cdc.runner "
        "--feed <dir> --table <dir> --stream --checkpoint <dir>"
    )


if __name__ == "__main__":
    main()
