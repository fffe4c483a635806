"""Explicit schemas for the tracking-shaped tables.

The reference infers everything from CSV (main_cuda.py:120-123); at
scale explicit schemas are mandatory (single-pass reads, stable types).
Column set mirrors /root/reference/docs/dataset.txt (23 input cols,
6 output cols) and FIXTURES.md §2-3.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRACKING_INPUT_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType(), False),
        T.StructField("play_id", T.LongType(), False),
        T.StructField("nfl_id", T.LongType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("player_to_predict", T.BooleanType(), True),
        T.StructField("play_direction", T.StringType(), True),
        T.StructField("absolute_yardline_number", T.IntegerType(), True),
        T.StructField("player_name", T.StringType(), True),
        T.StructField("player_height", T.StringType(), True),
        T.StructField("player_weight", T.DoubleType(), True),
        T.StructField("player_birth_date", T.StringType(), True),
        T.StructField("player_position", T.StringType(), True),
        T.StructField("player_side", T.StringType(), True),
        T.StructField("player_role", T.StringType(), True),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("s", T.DoubleType(), True),
        T.StructField("a", T.DoubleType(), True),
        T.StructField("o", T.DoubleType(), True),
        T.StructField("dir", T.DoubleType(), True),
        T.StructField("num_frames_output", T.IntegerType(), True),
        T.StructField("ball_land_x", T.DoubleType(), True),
        T.StructField("ball_land_y", T.DoubleType(), True),
    ]
)

TRACKING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType(), False),
        T.StructField("play_id", T.LongType(), False),
        T.StructField("nfl_id", T.LongType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)

SUBMISSION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)

# The composite grains (SURVEY §1)
TRAJECTORY_KEY = ["game_id", "play_id", "nfl_id"]
FRAME_KEY = ["game_id", "play_id", "frame_id"]
ROW_KEY = TRAJECTORY_KEY + ["frame_id"]
