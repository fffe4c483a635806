"""Deterministic synthetic tracking data (FIXTURES.md §2-3).

Generates frames/frames_out tables shaped like the reference's
train/input_* / output_* CSVs, with the edge cases FIXTURES.md calls
out: short trajectories, singleton frame groups, rank ties, isolated
players, malformed heights, NULL measures, angle wrap-around.

Used by the reference-shaped integration tests; NOT by the judged
queries (those run on the driver's /root/testdata tables).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession

from .schema import TRACKING_INPUT_SCHEMA, TRACKING_OUTPUT_SCHEMA

ROLES = ["Targeted Receiver", "Passer", "Defensive Coverage", "Other Route Runner"]


def make_tracking_tables(
    spark: SparkSession,
    n_games: int = 2,
    n_plays: int = 4,
    n_players: int = 8,
    n_frames: int = 24,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    rng = random.Random(seed)
    in_rows, out_rows = [], []
    for g in range(n_games):
        game_id = 2023090700 + g
        for p in range(n_plays):
            play_id = 100 + p  # reused across games (join-key trap)
            bx, by = rng.uniform(20, 100), rng.uniform(5, 48)
            for n in range(n_players):
                nfl_id = 40000 + n
                predict = n < 3
                side = None if (n == n_players - 1 and p == 0) else (
                    "Offense" if n % 2 == 0 else "Defense"
                )
                height = "" if (n == 0 and p == 0) else f"{rng.randint(5,6)}-{rng.randint(0,11)}"
                weight = None if (n == 1 and p == 0) else rng.uniform(180, 330)
                x, y = rng.uniform(1, 119), rng.uniform(1, 52)
                speed, direction = rng.uniform(0, 9), rng.uniform(0, 360)
                # one short trajectory (<8 frames), one singleton group
                frames = 3 if (n == 2 and p == 1) else n_frames
                for f in range(1, frames + 1):
                    direction = (direction + rng.uniform(-8, 8)) % 360
                    x = min(119.9, max(0.1, x + speed * 0.1 * math.sin(math.radians(direction))))
                    y = min(53.2, max(0.1, y + speed * 0.1 * math.cos(math.radians(direction))))
                    speed = max(0.0, speed + rng.uniform(-0.4, 0.4))
                    in_rows.append(
                        (
                            game_id, play_id, nfl_id, f, predict,
                            "left" if p % 2 else "right", rng.randint(1, 99),
                            f"P{n}", height, weight, "1995-01-01",
                            "WR" if n % 2 == 0 else "CB", side, ROLES[n % 4],
                            x, y,
                            None if (n == 3 and f == 1) else speed,
                            None if (n == 3 and f == 2) else rng.uniform(0, 6),
                            rng.uniform(0, 360), direction,
                            10, bx, by,
                        )
                    )
                if predict:
                    horizon = rng.randint(5, 14)  # ragged horizons
                    ox, oy = x, y
                    for f in range(1, horizon + 1):  # output frames restart at 1
                        ox = min(119.9, max(0.1, ox + rng.uniform(-1, 1)))
                        oy = min(53.2, max(0.1, oy + rng.uniform(-1, 1)))
                        out_rows.append((game_id, play_id, nfl_id, f, ox, oy))
    # output-only trajectory (left-join null path, FIXTURES §3)
    out_rows.append((2023090700, 100, 49999, 1, 50.0, 25.0))
    inp = spark.createDataFrame(in_rows, TRACKING_INPUT_SCHEMA)
    outp = spark.createDataFrame(out_rows, TRACKING_OUTPUT_SCHEMA)
    return inp, outp
