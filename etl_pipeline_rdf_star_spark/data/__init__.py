from .synth import (  # noqa: F401
    cdc_events,
    cdc_events_sql,
    expected_final_state,
    expected_final_state_sql,
    repo_files,
    repo_files_sql,
    scale_params,
)
