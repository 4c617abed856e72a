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


# ---------------------------------------------------------------------------
# Quarantine (reference README.md:110-115 escalation ladder): files that end
# a run in FALLO_SISTEMA / FALLO_LAYOUT move to a quarantine directory, get
# re-attempted automatically on subsequent runs for up to ``max_age_days``
# days (reference: "Reintento automático al día siguiente (máx. 2 días)"),
# then stay quarantined for manual inspection. Driver-side local-filesystem
# bookkeeping, same operational tier as archive_processed above.
# ---------------------------------------------------------------------------

QUARANTINE_LEDGER = "_quarantine.json"


def _load_ledger(quarantine_dir: str) -> dict[str, str]:
    import json

    path = os.path.join(quarantine_dir, QUARANTINE_LEDGER)
    if not os.path.isfile(path):
        return {}
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _save_ledger(quarantine_dir: str, ledger: dict[str, str]) -> None:
    import json

    tmp = os.path.join(quarantine_dir, QUARANTINE_LEDGER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(ledger, f, indent=0, sort_keys=True)
    os.replace(tmp, os.path.join(quarantine_dir, QUARANTINE_LEDGER))


def quarantine_failures(
    input_dir: str,
    quarantine_dir: str,
    failures: list[str],
    today: datetime.date | None = None,
) -> dict:
    """Move failed report files into quarantine, recording FIRST-failure dates.

    A re-quarantined file (failed again on its retry day) keeps its original
    date — the 2-day abandon clock runs from the first failure, not the last.
    Returns {"quarantined": [...]}.
    """
    today = today or datetime.date.today()
    os.makedirs(quarantine_dir, exist_ok=True)
    ledger = _load_ledger(quarantine_dir)
    moved: list[str] = []
    for fname in sorted(set(failures)):
        src = os.path.join(input_dir, fname)
        if os.path.isfile(src):
            shutil.move(src, os.path.join(quarantine_dir, fname))
            moved.append(fname)
            ledger.setdefault(fname, today.isoformat())
    if moved:
        _save_ledger(quarantine_dir, ledger)
    return {"quarantined": moved}


def requeue_quarantined(
    input_dir: str,
    quarantine_dir: str,
    today: datetime.date | None = None,
    max_age_days: int = 2,
) -> dict:
    """Move quarantined files back into the input dir for their automatic
    retry; files first quarantined more than ``max_age_days`` days ago are
    left in place (abandoned — manual intervention required).

    Returns {"requeued": [...], "abandoned": [...]}.
    """
    today = today or datetime.date.today()
    if not os.path.isdir(quarantine_dir):
        return {"requeued": [], "abandoned": []}
    ledger = _load_ledger(quarantine_dir)
    requeued: list[str] = []
    abandoned: list[str] = []
    for fname, first in sorted(ledger.items()):
        path = os.path.join(quarantine_dir, fname)
        if not os.path.isfile(path):
            continue
        age = (today - datetime.date.fromisoformat(first)).days
        if age <= max_age_days:
            shutil.move(path, os.path.join(input_dir, fname))
            requeued.append(fname)
        else:
            abandoned.append(fname)
    return {"requeued": requeued, "abandoned": abandoned}
