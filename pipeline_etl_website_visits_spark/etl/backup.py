"""File-lifecycle epilogue (O5): backup/zip/retention for processed reports.

Mirrors the reference's post-processing (utils/utils_postprocessing.py:8-50:
move each processed file to the backup directory, bundle everything there
into a daily ``backup_DDMMYY.zip``, delete the loose files) plus a retention
sweep for old zips. This is deliberately a DRIVER-SIDE local-filesystem
epilogue, exactly like the reference: it manages the tiny ingest staging
area, not the data lake. At 100 TB the equivalent is the streaming source's
``cleanSource=archive`` option (docs/SCALE.md) — this module exists for
operational parity with the reference so a migrating user keeps their
backup zips.

Only files with a bitacora completion marker are archived — a file the ETL
has not committed yet is never moved out from under a future run.
"""

from __future__ import annotations

import datetime
import os
import shutil
import zipfile


def archive_processed(
    input_dir: str,
    backup_dir: str,
    processed: set[str],
    today: datetime.date | None = None,
    retention_days: int = 90,
) -> dict:
    """Move ``processed`` report files from ``input_dir`` into ``backup_dir``,
    compress them into ``backup_DDMMYY.zip`` (reference date format,
    utils/utils_postprocessing.py:43), delete the loose copies, and drop
    backup zips older than ``retention_days``.

    ``processed`` is the commit-marker set (``Warehouse.processed_files()``).
    Returns a summary dict: {"archived": [...], "zip": path|None,
    "purged": [...]}.
    """
    today = today or datetime.date.today()
    os.makedirs(backup_dir, exist_ok=True)

    moved: list[str] = []
    for fname in sorted(processed):
        src = os.path.join(input_dir, fname)
        if os.path.isfile(src):
            shutil.move(src, os.path.join(backup_dir, fname))
            moved.append(fname)

    # zip every loose report in the backup dir (including strays from a
    # previous crashed epilogue), then remove the loose copies
    loose = sorted(
        f for f in os.listdir(backup_dir) if f.startswith("report_") and f.endswith(".txt")
    )
    zip_path = None
    if loose:
        zip_path = os.path.join(backup_dir, f"backup_{today.strftime('%d%m%y')}.zip")
        # append when the daily zip already exists (multiple runs per day)
        mode = "a" if os.path.exists(zip_path) else "w"
        with zipfile.ZipFile(zip_path, mode, zipfile.ZIP_DEFLATED) as zf:
            existing = set(zf.namelist())
            for fname in loose:
                if fname not in existing:
                    zf.write(os.path.join(backup_dir, fname), fname)
                os.unlink(os.path.join(backup_dir, fname))

    purged: list[str] = []
    cutoff = today - datetime.timedelta(days=retention_days)
    for fname in sorted(os.listdir(backup_dir)):
        if not (fname.startswith("backup_") and fname.endswith(".zip")):
            continue
        try:
            stamp = datetime.datetime.strptime(fname[len("backup_"):-len(".zip")], "%d%m%y").date()
        except ValueError:
            continue
        if stamp < cutoff:
            os.unlink(os.path.join(backup_dir, fname))
            purged.append(fname)

    return {"archived": moved, "zip": zip_path, "purged": purged}
