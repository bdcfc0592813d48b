"""Static skill dictionary — transcribed as DATA from the reference.

The reference embeds a 16-category / ~350-term dictionary as a Python
dict literal (reference: JobScraper/scrapers/pracuj_scraper.py:25-42)
and a variant→canonical normalization map
(pracuj_scraper.py:204-214). Here both become small broadcast
dimension DataFrames — the idiomatic Spark shape for a classification
join (SURVEY.md §2 rows 27-28).

``category_rank`` preserves the reference's first-match-wins
iteration order deterministically under parallelism (dict insertion
order is the tiebreak in the reference's linear scan,
scraper.py:20-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# category -> terms, in the reference's dict order (pracuj_scraper.py:25-42).
SKILL_CATEGORIES: dict[str, list[str]] = {
    "Database": ["sql", "mysql", "postgresql", "oracle", "nosql", "mongodb", "database", "ms access", "sqlite", "redshift", "snowflake", "microsoft sql server", "teradata", "clickhouse", "azure sql database", "azure sql managed instance", "mariadb", "ms sql", "sql i pl/sql", "oracle forms", "oracle apex", "oracle ebs", "oracle application framework (oaf)", "oracle erp cloud", "sql server", "mssqlserver", "azure sql", "pl/pgsql", "aas", "neteza", "singlestore", "oracle fusion middleware", "oracle jdeveloper"],
    "Microsoft BI & Excel": ["excel", "power query", "power pivot", "vba", "macros", "pivot tables", "excel formulas", "spreadsheets", "m code", "ssrs", "ssis", "ssas", "power apps", "power automate", "powerpoint", "office 365", "microsoft power bi", "power bi", "power bi.", "ms office", "ms excel", "microsoft dynamics 365", "ms fabric"],
    "Visualization": ["tableau", "qlik", "looker", "data studio", "powerbi", "dax", "matplotlib", "seaborn", "plotly", "excel charts", "dashboard", "reporting", "d3.js", "grafana", "kibana", "google charts", "quicksight", "sas viya", "di studio", "eg", "sas studio", "visual analytics", "qliksense", "sas va", "qgis", "visio"],
    "Programming": ["python", "r", "java", "scala", "c#", ".net", "javascript", "typescript", "pandas", "numpy", "jupyter", "scikit-learn", "tidyverse", "julia", "sql scripting", "pl/sql", "t-sql", "linux", "windows", "unix", "windows server", "macos", "shell", "perl", "pyspark", "go", "rust", "c++", "c", "jee", "scala 3", "next.js", "fastapi", "rest", "spring framework", "css", "html", "u-boot", "yocto", "sas4gl", "mql5", "xml", "uml", "bpmn", "golang", "graphql", "spring boot", "hibernate", "flask api", "pytest", "junit", "liquibase", "angular", "vue.js", "ngrx", "swagger"],
    "Data Processing": ["etl", "spark", "hadoop", "kafka", "airflow", "data engineering", "big data", "data cleansing", "data transformation", "data modeling", "data warehouse", "databricks", "dbt", "talend", "informatica", "apache spark", "starrocks", "iceberg", "bigquery", "matillion", "data built tool", "apache airflow", "data lake", "adf", "azure data factory", "azure data lake", "parquet", "dwh", "elt/elt", "apache kafka", "alteryx", "azure databricks", "synapse analytics", "informatica cloud"],
    "Analytics & Statistics": ["statistics", "regression", "forecasting", "analytics", "analysis", "spss", "sas", "stata", "hypothesis testing", "a/b testing", "statistical", "time series", "clustering", "segmentation", "correlation", "adobe analytics", "google analytics", "sas di", "sas eg", "sas 4gl", "sas macro language", "data science", "data analytics"],
    "Cloud": ["aws", "azure", "gcp", "google cloud", "cloud", "onedrive", "sharepoint", "snowflake", "lambda", "s3", "pub/sub", "dataflow", "terraform", "google cloud services (big query)", "microsoft azure", "snowflake data cloud", "google cloud platform", "sap datasphere", "azure synapse", "azure functions", "azure repos", "microsoft  azure", "redis", "azure event hub", "ansible", "terragrunt", "vertex ai", "sagemaker", "azure devops"],
    "Business Intelligence": ["business intelligence", "bi", "cognos", "business objects", "microstrategy", "olap", "data mart", "reporting", "kpi", "metrics", "domo", "sisense", "bi publisher", "mis"],
    "Machine Learning and AI": ["machine learning", "scikit-learn", "tensorflow", "keras", "pytorch", "deep learning", "xgboost", "lightgbm", "nlp", "computer vision", "anomaly detection", "feature engineering", "opencv", "langchain", "pydantic", "langgraph", "hugging face ml tools", "mlops", "dagster", "llm", "ai", "ml", "transformers", "openai api", "tensorrt", "seldon", "onnx", "cap’n proto", "llamaindex", "mlflow", "kubeflow", "vllm", "pinecone", "faiss", "chroma", "llm/nlp", "sciklit-learn", "palantir foundry"],
    "Data Governance and Quality": ["data governance", "data quality", "data integrity", "data validation", "master data management", "metadata", "data lineage", "data catalog", "atlan", "collibra", "cdi", "cai", "cdgc"],
    "Data Privacy and Security": ["data privacy", "gdpr", "data security", "compliance", "pii", "data anonymization"],
    "Project Management and Soft Skills": ["project management", "agile", "scrum", "communication", "presentation", "storytelling", "collaboration", "stakeholder management", "requirements gathering", "jira", "confluence", "agile methodologies", "servicenow", "bugzilla", "otrs"],
    "Version Control": ["git", "github", "gitlab", "bitbucket", "svn"],
    "Data Integration and APIs": ["api", "rest api", "data integration", "web scraping", "etl tools", "soap", "ip rotation services", "google python apis", "rest apis", "soapui", "oracle service bus", "oracle soa"],
    "ERP and CRM Systems": ["sap", "oracle", "salesforce", "dynamics", "erp", "crm", "workday"],
    "DevOps": ["jenkins", "openshift", "docker", "kubernetes", "bamboo", "ci/cd", "maven", "gradle", "sonarqube", "argocd", "jenkins / ansible", "controlm", "liquiibase", "sonar"],
}

# canonical -> variants (reference: pracuj_scraper.py:204-214).
SKILL_VARIATIONS: dict[str, list[str]] = {
    "sql": ["sql", "structured query language", "sql server", "t-sql"],
    "python": ["python", "język python"],
    "power bi": ["power bi", "powerbi", "power-bi"],
    "excel": ["excel", "microsoft excel", "ms excel"],
    "tableau": ["tableau"],
    "java": ["java"],
    "javascript": ["javascript", "js"],
    "azure": ["azure", "microsoft azure"],
    "aws": ["aws", "amazon web services"],
}


def dictionary_rows() -> list[tuple[str, str, int]]:
    """(term, category, category_rank) rows; rank = first-match order."""
    rows = []
    for rank, (category, terms) in enumerate(SKILL_CATEGORIES.items()):
        for term in terms:
            rows.append((term, category, rank))
    return rows


def variation_rows() -> list[tuple[str, str]]:
    """(variant, canonical) rows."""
    return [
        (variant, canonical)
        for canonical, variants in SKILL_VARIATIONS.items()
        for variant in variants
    ]


def _sql_str(s: str) -> str:
    # backslashes first: Spark's default string-literal parser
    # interprets \-escapes (spark.sql.parser.escapedStringLiterals is
    # false), so a lone backslash would be re-interpreted downstream
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def values_df(spark: SparkSession, rows, cols: list[str]) -> DataFrame:
    """Small static dimension as a pure-SQL VALUES relation.

    Deliberately NOT spark.createDataFrame(list): that builds a
    Python-RDD-backed plan, so every downstream JVM query would spawn
    Python workers just to scan a 350-row constant table (measured:
    tens of seconds of worker-pool serialization on a 32-thread local
    session). A VALUES literal is a JVM LocalRelation — broadcastable,
    Python-free, constant-folded by Catalyst."""
    def lit(v) -> str:
        if isinstance(v, str):
            return _sql_str(v)
        if v is None:
            return "NULL"
        return str(v)

    values = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t({', '.join(cols)})")


def skill_dictionary_df(spark: SparkSession) -> DataFrame:
    """Broadcast-sized dimension: one row per (term, category, rank).

    A term can appear under several categories (e.g. "oracle",
    "snowflake", "reporting", "scikit-learn"); first-match semantics
    keep the lowest rank — resolve with min(category_rank) before
    joining so the dim is unique on term.
    """
    return values_df(
        spark, dictionary_rows(), ["term", "category", "category_rank"]
    )


def skill_variations_df(spark: SparkSession) -> DataFrame:
    return values_df(spark, variation_rows(), ["variant", "canonical"])
