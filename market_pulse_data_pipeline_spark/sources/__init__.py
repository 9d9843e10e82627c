from market_pulse_data_pipeline_spark.sources.tables import load_table, load_tables  # noqa: F401
from market_pulse_data_pipeline_spark.sources.landing import (  # noqa: F401
    read_landing_json,
    write_landing_doc,
    landing_to_raw,
)
