"""E32 — manifest-verified writes: a clean round trip verifies ok;
deleting, adding, or rewriting a data file is detected by name with
row counts reconciled."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from big_data_bowl___2023_spark.sources.io import (
    load_table,
    verify_parquet_manifest,
    write_parquet_with_manifest,
)


def test_manifest_round_trip_and_tamper_detection(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").repartition(4)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/orders"
        manifest = write_parquet_with_manifest(orders, path)
        assert manifest["total_rows"] == orders.count()
        assert len(manifest["files"]) == 4

        res = verify_parquet_manifest(spark, path)
        assert res["ok"], res
        assert res["rows_found"] == res["rows_expected"]

        files = sorted(glob.glob(f"{path}/part-*.parquet"))
        # delete one file -> missing + row shortfall
        victim = files[0]
        backup = f"{tmp}/backup.parquet"
        shutil.copyfile(victim, backup)
        os.remove(victim)
        res = verify_parquet_manifest(spark, path)
        assert not res["ok"]
        assert res["missing"] == [os.path.basename(victim)]
        assert res["rows_found"] < res["rows_expected"]

        # restore + add an orphan copy -> extra
        shutil.copyfile(backup, victim)
        orphan = f"{path}/part-99999-orphan.parquet"
        shutil.copyfile(backup, orphan)
        res = verify_parquet_manifest(spark, path)
        assert not res["ok"]
        assert res["extra"] == [os.path.basename(orphan)]

        # replace the orphan'd state with a modified file: swap one
        # data file's content for another's (the local-fs Hadoop CRC
        # sidecar must follow the content, or Hadoop's own checksum
        # layer fires first — object stores have no sidecars)
        os.remove(orphan)
        shutil.copyfile(files[1], victim)

        def _crc(p):
            return os.path.join(os.path.dirname(p),
                                f".{os.path.basename(p)}.crc")

        shutil.copyfile(_crc(files[1]), _crc(victim))
        res = verify_parquet_manifest(spark, path)
        assert not res["ok"]
        assert os.path.basename(victim) in res["modified"]
