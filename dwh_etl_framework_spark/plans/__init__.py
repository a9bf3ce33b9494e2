from dwh_etl_framework_spark.plans.config import (
    DependencyConfig,
    PipelineConfig,
    TableConfig,
    TransformStep,
    load_pipeline_config,
)
from dwh_etl_framework_spark.plans.params import fill_sql_parameters
from dwh_etl_framework_spark.plans.steps import (
    StepContext,
    checkpoint,
    run_python_step,
    run_select_step,
    run_transform_steps,
)
from dwh_etl_framework_spark.plans.pipeline import Pipeline

__all__ = [
    "DependencyConfig",
    "PipelineConfig",
    "TableConfig",
    "TransformStep",
    "load_pipeline_config",
    "fill_sql_parameters",
    "StepContext",
    "checkpoint",
    "run_python_step",
    "run_select_step",
    "run_transform_steps",
    "Pipeline",
]
