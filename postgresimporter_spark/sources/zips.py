"""Zip-archive extraction (reference S1/S2, main.py:144-169, 474-489).

The reference shells out to ``unzip -o src -d dest``. Driver-side
``zipfile`` extraction keeps those semantics (including ``-o`` overwrite).

For archives living on distributed storage at scale, a distributed
variant reads them with the ``binaryFile`` source and extracts members
inside ``mapInPandas`` so no single node must see every archive.
"""

from __future__ import annotations

import zipfile
from collections.abc import Iterator
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..discovery import ZipJob


def extract_zips(jobs: list[ZipJob]) -> list[Path]:
    """Extract each archive into its destination dir (overwrite), driver-side.

    Returns the destination directories. Failures are logged per archive
    and do not abort the batch (reference failure semantics,
    main.py:376-404: log-and-continue).
    """
    import logging

    done = []
    for job in jobs:
        try:
            job.dest.mkdir(parents=True, exist_ok=True)
            with zipfile.ZipFile(job.src) as zf:
                zf.extractall(job.dest)
            done.append(job.dest)
        except Exception:  # noqa: BLE001 - reference logs and continues
            logging.getLogger(__name__).exception("unzip failed: %s", job.src)
    return done


def extract_zips_distributed(
    spark: SparkSession, zip_glob: str
) -> DataFrame:
    """Distributed extraction: archive bytes -> (archive, member, content).

    Each executor extracts the archives in its partition; member contents
    come back as a ``binary`` column for downstream parsing. Scales to
    archive sets that do not fit on one node.
    """
    import pandas as pd

    bin_df = spark.read.format("binaryFile").load(zip_glob)

    def explode_members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                with zipfile.ZipFile(io.BytesIO(r["content"])) as zf:
                    for name in zf.namelist():
                        if name.endswith("/"):
                            continue
                        rows.append(
                            {
                                "archive": r["path"],
                                "member": name,
                                "content": zf.read(name),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "content"]
            )

    return bin_df.select("path", "content").mapInPandas(
        explode_members,
        schema="archive string, member string, content binary",
    )
