"""Synthetic report_*.txt fixture generator (FIXTURES.md §F-A/F-B)."""

from __future__ import annotations

import csv
import os

HEADER = [
    "email",
    "jyv",
    "Badmail",
    "Baja",
    "Fecha envio",
    "Fecha open",
    "Opens",
    "Opens virales",
    "Fecha click",
    "Clicks",
    "Clicks virales",
    "Links",
    "IPs",
    "Navegadores",
    "Plataformas",
]


def valid_row(i: int, email: str | None = None) -> list[str]:
    return [
        email or f"user{i}@example.com",
        "j",
        "",
        "-",
        f"{(i % 28) + 1:02d}/03/2026 14:{i % 60:02d}",
        f"{(i % 28) + 1:02d}/03/2026 15:{i % 60:02d}",
        str(i % 50),
        str(i % 10),
        "",
        str(i % 30),
        str(i % 5),
        "http://example.com/a",
        "1.2.3.4; 5.6.7.8",
        "Chrome",
        "Windows",
    ]


def write_csv(path: str, header: list[str], rows: list[list[str]]) -> str:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    return path


def make_allvalid(dirpath: str, name: str = "report_allvalid.txt", n: int = 100) -> str:
    # duplicate emails present for the groupBy (10 distinct emails).
    rows = [valid_row(i, email=f"user{i % 10}@example.com") for i in range(n)]
    return write_csv(os.path.join(dirpath, name), HEADER, rows)


def make_mixed(dirpath: str, name: str = "report_mixed.txt") -> str:
    """70 valid, 10 bad-email-only, 10 bad-one-date, 10 bad-email+2-dates
    (=> 50 error rows, 30 invalid source rows — FIXTURES.md F-B)."""
    rows = [valid_row(i) for i in range(70)]
    for i in range(10):  # bad email only
        r = valid_row(70 + i)
        r[0] = "no-at-sign.com"
        rows.append(r)
    for i in range(10):  # bad one date (Fecha envio not strict format)
        r = valid_row(80 + i)
        r[4] = "2026-03-05 14:30"
        rows.append(r)
    for i in range(10):  # bad email + 2 bad dates
        r = valid_row(90 + i)
        r[0] = ".leading@dot.com"
        r[4] = "5/3/2026 9:05"
        r[5] = "05/03/2026 24:01"
        rows.append(r)
    return write_csv(os.path.join(dirpath, name), HEADER, rows)


def make_empty(dirpath: str, name: str = "report_empty.txt") -> str:
    return write_csv(os.path.join(dirpath, name), HEADER, [])


def make_badlayout(dirpath: str, name: str = "report_badlayout.txt") -> str:
    header = [c for c in HEADER if c != "Opens"]
    rows = [[v for j, v in enumerate(valid_row(i)) if HEADER[j] != "Opens"] for i in range(5)]
    return write_csv(os.path.join(dirpath, name), header, rows)


def make_extracol(dirpath: str, name: str = "report_extracol.txt") -> str:
    header = HEADER + ["Extra"]
    rows = [valid_row(i) + ["x"] for i in range(5)]
    return write_csv(os.path.join(dirpath, name), header, rows)


def make_placeholders(dirpath: str, name: str = "report_placeholders.txt") -> str:
    rows = []
    for i in range(10):
        r = valid_row(i)
        r[1] = "-"      # jyv -> NULL
        r[2] = "0"      # Badmail -> NULL
        r[6] = "0"      # Opens stays 0 (int, D7 ruling)
        r[13] = "-"     # Navegadores -> NULL
        rows.append(r)
    return write_csv(os.path.join(dirpath, name), HEADER, rows)
