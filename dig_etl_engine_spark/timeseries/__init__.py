"""Time-series subsystem (SURVEY.md §2.10, T1-T6).

Reference: ``utilities/timeseries/`` — annotated-spreadsheet extraction into
Measure/Measurement/Trend records. Driver-side parsing (T1-T2: spreadsheets
are inherently small) feeds Spark-native imputation/emission (T3-T6: the
per-point work scales with data).
"""
