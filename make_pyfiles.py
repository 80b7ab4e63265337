"""Package the library for spark-submit --py-files: dist/sdqf_spark.zip."""

from __future__ import annotations

import os
import zipfile

PKG = "standard_data_quality_framework_spark"


def build(out: str = "dist/sdqf_spark.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    path = os.path.join(root, out)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return path


if __name__ == "__main__":
    print(build())
