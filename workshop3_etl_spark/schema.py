"""Canonical schema + per-year alias maps for the happiness pipeline.

Single source of truth shared by batch ETL, ML, and streaming — the
property the reference stresses (`README.md:100-104`; constants at
`src/etl.py:13-21`). The five yearly CSVs have mutually-incompatible
headers (FIXTURES.md A1-A3); these maps normalize them
(`src/etl.py:38-73`; notebook variant `notebooks/EDA.ipynb:265-276`).
"""

from __future__ import annotations

from pyspark.sql import types as T

ID_COLS = ["Country", "Year"]
FEATURES = [
    "GDP per capita",
    "Social support",
    "Healthy life expectancy",
    "Freedom",
    "Perceptions of corruption",
]
TARGET = "Happiness Score"
MODEL_COLS = FEATURES + [TARGET]
CANONICAL_COLS = ID_COLS + FEATURES + [TARGET]

CANONICAL_SCHEMA = T.StructType(
    [
        T.StructField("Country", T.StringType(), False),
        T.StructField("Year", T.IntegerType(), True),
        T.StructField("GDP per capita", T.DoubleType(), True),
        T.StructField("Social support", T.DoubleType(), True),
        T.StructField("Healthy life expectancy", T.DoubleType(), True),
        T.StructField("Freedom", T.DoubleType(), True),
        T.StructField("Perceptions of corruption", T.DoubleType(), True),
        T.StructField("Happiness Score", T.DoubleType(), True),
    ]
)

# source-header -> canonical-name, per year (`src/etl.py:38-73`).
ALIASES_2015_2016 = {
    "Country": "Country",
    "Happiness Score": "Happiness Score",
    "Economy (GDP per Capita)": "GDP per capita",
    "Family": "Social support",
    "Health (Life Expectancy)": "Healthy life expectancy",
    "Freedom": "Freedom",
    "Trust (Government Corruption)": "Perceptions of corruption",
}

ALIASES_2017 = {
    "Country": "Country",
    "Happiness.Score": "Happiness Score",
    "Economy..GDP.per.Capita.": "GDP per capita",
    "Family": "Social support",
    "Health..Life.Expectancy.": "Healthy life expectancy",
    "Freedom": "Freedom",
    "Trust..Government.Corruption.": "Perceptions of corruption",
}

ALIASES_2018_2019 = {
    "Country or region": "Country",
    "Score": "Happiness Score",
    "GDP per capita": "GDP per capita",
    "Social support": "Social support",
    "Healthy life expectancy": "Healthy life expectancy",
    "Freedom to make life choices": "Freedom",
    "Perceptions of corruption": "Perceptions of corruption",
}

YEAR_ALIASES: dict[int, dict[str, str]] = {
    2015: ALIASES_2015_2016,
    2016: ALIASES_2015_2016,
    2017: ALIASES_2017,
    2018: ALIASES_2018_2019,
    2019: ALIASES_2018_2019,
}

# Kafka message shape (`kafka/producer.py:92-103`, README.md:186-199).
MESSAGE_SCHEMA = T.StructType(
    list(CANONICAL_SCHEMA.fields)
    + [
        T.StructField("is_train", T.IntegerType(), True),
        T.StructField("is_test", T.IntegerType(), True),
    ]
)

# Warehouse table `predictions` (`kafka/consumer.py:77-92`): short
# column names + y_true/y_pred + the 4-column idempotency key.
WAREHOUSE_COLS = {
    "Country": "country",
    "Year": "year",
    "GDP per capita": "gdp",
    "Social support": "social",
    "Healthy life expectancy": "health",
    "Freedom": "freedom",
    "Perceptions of corruption": "corrupt",
    "Happiness Score": "y_true",
}
UPSERT_KEY = ["country", "year", "is_train", "is_test"]
