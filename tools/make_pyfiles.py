"""Build the --py-files archive for spark-submit (deterministic zip).

Produces ``dist/mistral_ocr_pipeline_spark.zip`` containing the engine
package; executors unpack it onto sys.path.  (A wheel built with
setuptools works identically; the zip keeps this container dependency-free.)
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
PKG = ROOT / "mistral_ocr_pipeline_spark"
OUT = ROOT / "dist" / "mistral_ocr_pipeline_spark.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    files = sorted(
        p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(ROOT)))  # fixed date → deterministic
            z.writestr(info, p.read_bytes())
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {len(files)} files)")


if __name__ == "__main__":
    main()
