"""Deterministic reference-shaped ride CSV fixture (FIXTURES.md
section A1): semicolon-delimited, header row, ~0.2%-style edge rows
scaled up — null end stations/coords, zero-duration trips,
timestamps without fractional seconds (the rows the reference's
strict '%f' parse crashes on), all pinned for golden assertions.
"""

from __future__ import annotations

import csv
import random
from datetime import datetime, timedelta

STATIONS = [
    ("Grove St PATH", 40.719586, -74.043117),
    ("Hamilton Park", 40.727596, -74.044247),
    ("Sip Ave", 40.730897, -74.063913),
    ("Newport Pkwy", 40.728745, -74.032108),
    ("Harborside", 40.719252, -74.034234),
    ("Exchange Pl", 40.716247, -74.033459),
    ("Paulus Hook", 40.714145, -74.033552),
    ("City Hall", 40.717732, -74.043845),
    ("Van Vorst Park", 40.718489, -74.047727),
    ("Marin Blvd", 40.714584, -74.042817),
]

HEADER = [
    "ride_id",
    "rideable_type",
    "started_at",
    "ended_at",
    "start_station_name",
    "start_station_id",
    "end_station_name",
    "end_station_id",
    "start_lat",
    "start_lng",
    "end_lat",
    "end_lng",
    "member_casual",
]

# pinned row for hand-computed measure assertions
PINNED = {
    "ride_id": "ridepin000000001",
    "rideable_type": "classic_bike",
    "started_at": "2025-01-10 08:00:00.500",
    "ended_at": "2025-01-10 08:20:30.750",
    "start": STATIONS[0],  # Grove St PATH
    "end": STATIONS[3],  # Newport Pkwy
    "member_casual": "member",
}


def write_fixture(path: str, n_rows: int = 240) -> dict:
    """Write the fixture; returns expected facts for assertions."""
    rng = random.Random(1234)
    t0 = datetime(2025, 1, 1, 6, 0, 0)
    rows = []

    # pinned measure row
    s = PINNED["start"]
    e = PINNED["end"]
    rows.append(
        [
            PINNED["ride_id"],
            PINNED["rideable_type"],
            PINNED["started_at"],
            PINNED["ended_at"],
            s[0],
            "JC001",
            e[0],
            "JC004",
            repr(s[1]),
            repr(s[2]),
            repr(e[1]),
            repr(e[2]),
            PINNED["member_casual"],
        ]
    )
    # zero-duration trip (speed must coerce to 0.0)
    rows.append(
        [
            "ridezero00000002",
            "electric_bike",
            "2025-01-11 09:30:15.136",
            "2025-01-11 09:30:15.136",
            s[0],
            "JC001",
            s[0],
            "JC001",
            repr(s[1]),
            repr(s[2]),
            repr(s[1]),
            repr(s[2]),
            "casual",
        ]
    )
    # null end station name+id, coords present
    rows.append(
        [
            "ridenullname0003",
            "classic_bike",
            "2025-01-12 10:00:00.001",
            "2025-01-12 10:15:00.002",
            s[0],
            "JC001",
            "",
            "",
            repr(s[1]),
            repr(s[2]),
            repr(e[1]),
            repr(e[2]),
            "member",
        ]
    )
    # fully-null end (name, id, coords) -> null distance, speed 0
    rows.append(
        [
            "ridenullend00004",
            "electric_bike",
            "2025-01-13 11:00:00.250",
            "2025-01-13 11:45:00.750",
            s[0],
            "JC001",
            "",
            "",
            repr(s[1]),
            repr(s[2]),
            "",
            "",
            "casual",
        ]
    )
    # no-fractional-seconds timestamps (reference would crash here)
    rows.append(
        [
            "ridenofrac000005",
            "classic_bike",
            "2025-01-14 12:00:00",
            "2025-01-14 12:30:00",
            e[0],
            "JC004",
            s[0],
            "JC001",
            repr(e[1]),
            repr(e[2]),
            repr(s[1]),
            repr(s[2]),
            "member",
        ]
    )
    # ISO-week edge: 2024-12-30 is ISO week 1 of 2025
    rows.append(
        [
            "rideisoweek00006",
            "classic_bike",
            "2024-12-30 08:00:00.100",
            "2024-12-30 08:10:00.100",
            s[0],
            "JC001",
            e[0],
            "JC004",
            repr(s[1]),
            repr(s[2]),
            repr(e[1]),
            repr(e[2]),
            "member",
        ]
    )

    n_edge = len(rows)
    for i in range(n_rows - n_edge):
        st = STATIONS[rng.randrange(len(STATIONS))]
        en = STATIONS[rng.randrange(len(STATIONS))]
        start = t0 + timedelta(
            minutes=rng.randrange(30 * 24 * 60), milliseconds=rng.randrange(1000)
        )
        end = start + timedelta(seconds=rng.randrange(120, 3600))
        rows.append(
            [
                f"ride{i:012d}",
                rng.choice(["classic_bike", "electric_bike"]),
                start.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3],
                end.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3],
                st[0],
                f"JC{STATIONS.index(st):03d}",
                en[0],
                f"JC{STATIONS.index(en):03d}",
                repr(st[1]),
                repr(st[2]),
                repr(en[1]),
                repr(en[2]),
                rng.choice(["member", "casual"]),
            ]
        )

    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(HEADER)
        w.writerows(rows)

    # expected values computed independently of the engine
    started = {r[2] for r in rows}
    ended = {r[3] for r in rows}
    stations = set()
    for r in rows:
        stations.add((r[4] or None, r[8] or None, r[9] or None))
        if r[6] or r[10]:
            stations.add((r[6] or None, r[10] or None, r[11] or None))
    return {
        "n_rows": len(rows),
        "n_member_types": len({r[12] for r in rows}),
        "n_rideable_types": len({r[1] for r in rows}),
        "n_station_rows": len(stations),
        "n_timestamps": len(started | ended),
    }
