"""Table-maintenance entry point for ManifestTable datasets: compaction
(small-file rewrite of the full chain union) and snapshot expiry (bounded
history, age-gated orphan cleanup).

Usage:
    python jobs/table_maintenance.py --table /data/tbl --compact \
        --target-file-mb 128
    python jobs/table_maintenance.py --table /data/tbl --expire --keep 3
    python jobs/table_maintenance.py --table /data/tbl --compact --expire

compact-then-expire is the lossless maintenance cycle for delta-style
chains (see cefspark/storage.py docstrings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True, help="manifest-table root")
    p.add_argument("--compact", action="store_true")
    p.add_argument("--expire", action="store_true")
    p.add_argument("--keep", type=int, default=1,
                   help="snapshots to keep on expiry")
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--cluster-by", default=None,
                   help="comma-separated columns: range-partition + sort the "
                        "rewrite so files carry tight min/max stats "
                        "(file-skipping on range filters)")
    p.add_argument("--orphan-grace-s", type=float, default=600.0)
    p.add_argument("--cpus", type=int, default=0)
    args = p.parse_args()
    if not (args.compact or args.expire):
        p.error("nothing to do: pass --compact and/or --expire")

    from cefspark.session import get_spark
    from cefspark.storage import ManifestTable

    table = ManifestTable(args.table)
    report: dict = {"table": args.table}
    if args.compact:
        spark = get_spark(app_name="cefspark-maintenance",
                          cores=args.cpus or None)
        snap = table.compact(spark,
                             target_file_bytes=args.target_file_mb << 20,
                             cluster_by=(args.cluster_by.split(",")
                                         if args.cluster_by else None))
        report["compacted_snapshot"] = snap.snapshot_id if snap else None
        report["compacted_rows"] = snap.n_rows if snap else 0
    if args.expire:
        gone = table.expire_snapshots(
            keep_last=args.keep, orphan_grace_seconds=args.orphan_grace_s)
        report["expired"] = gone
    report["latest"] = table.latest_snapshot_id()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
