from jobminer_spark.functions.text import (
    extract_job_id,
    extract_years_of_experience,
    salary_max_col,
    salary_min_col,
    truncate_to_widths,
    with_salary_range,
)

__all__ = [
    "extract_job_id",
    "extract_years_of_experience",
    "salary_min_col",
    "salary_max_col",
    "truncate_to_widths",
    "with_salary_range",
]
