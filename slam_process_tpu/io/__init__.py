from slam_process_tpu.io.hexlog import read_hex_log, tokenize_hex, tokenize_hex_reference  # noqa: F401
from slam_process_tpu.io.angles import load_angle_map, angle_lut  # noqa: F401
from slam_process_tpu.io.xlsx import read_xlsx_table, write_xlsx_table  # noqa: F401
from slam_process_tpu.io.schemas import (  # noqa: F401
    PARSED_COLUMNS,
    FILTERED_COLUMNS,
    read_parsed_table,
    read_filtered_table,
)
