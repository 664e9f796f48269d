"""Stepwise outlier screening chain — the reference's main user-facing API.

Reference: ``StepwiseOutlierDetection``
(/root/reference/diive/preprocessing/outlier_detection/stepwiseoutlierdetection.py:28)
and ``StepwiseMeteoScreeningDb`` (diive/preprocessing/qaqc/meteoscreening.py:37):
tests are chained interactively, ``.addflag()`` accumulates each test's flag
column, the overall QCF is computed at the end, rejected values are nulled,
and the cleaned series is resampled to 30 min.

Spark version: a builder over a DataFrame; each ``flag_*`` call appends a
FLAG_*_TEST column (lazily — one plan, no intermediate actions); ``finalize``
computes QCF, nulls rejected values, and optionally resamples. The
iterate-until-converged variants accept ``repeat=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.operators import outliers, resample


class StepwiseScreening:
    def __init__(self, df: DataFrame, key_cols: list[str], ts_col: str, value_col: str,
                 tier_seconds: int = 1800):
        self.df = df
        self.key_cols = key_cols
        self.ts_col = ts_col
        self.value_col = value_col
        self.tier_seconds = tier_seconds
        self._n = 0

    def _name(self, test: str) -> str:
        self._n += 1
        self._last_flag = f"FLAG_{self._n}_{self.value_col}_{test}_TEST"
        return self._last_flag

    def restrict_application(self, application_dates: list,
                             fill_value=None,
                             flag_col: str | None = None
                             ) -> "StepwiseScreening":
        """Restrict the most recent test's flag (or ``flag_col``) to the
        given dates/date ranges, ``fill_value`` elsewhere — the
        reference's ``restrict_application`` wired into the screening
        chain so ANY test can be date-restricted (the AoA EddyPro flag
        was previously the only operator with this semantics)."""
        target = flag_col or getattr(self, "_last_flag", None)
        if target is None:
            raise ValueError("no flag test added yet to restrict")
        self.df = outliers.restrict_application(
            self.df, self.ts_col, target, application_dates,
            fill_value=fill_value)
        return self

    def flag_absolute_limits(self, minval: float, maxval: float) -> "StepwiseScreening":
        self.df = outliers.flag_absolute_limits(
            self.df, self.value_col, minval, maxval, flag_col=self._name("ABSLIM")
        )
        return self

    def flag_manual_removal(self, ranges=None, timestamps=None) -> "StepwiseScreening":
        self.df = outliers.flag_manual_removal(
            self.df, self.ts_col, self.value_col, ranges, timestamps,
            flag_col=self._name("MANUAL"),
        )
        return self

    def flag_zscore(self, thres: float = 4.0, repeat: bool = False,
                    group_cols: list[str] | None = None) -> "StepwiseScreening":
        name = self._name("ZSCORE")
        if repeat:
            self.df = outliers.repeat_flag(
                self.df,
                lambda d, v: outliers.flag_zscore(d, self.key_cols, v, thres,
                                                  group_cols, flag_col=name),
                self.value_col, name,
            )
        else:
            self.df = outliers.flag_zscore(self.df, self.key_cols, self.value_col,
                                           thres, group_cols, flag_col=name)
        return self

    def flag_zscore_rolling(self, thres: float = 4.0, winsize: int = 50) -> "StepwiseScreening":
        self.df = outliers.flag_zscore_rolling(
            self.df, self.key_cols, self.ts_col, self.value_col, thres, winsize,
            flag_col=self._name("ZSCOREROLLING"),
        )
        return self

    def flag_zscore_increments(self, thres: float = 4.0) -> "StepwiseScreening":
        self.df = outliers.flag_zscore_increments(
            self.df, self.key_cols, self.ts_col, self.value_col, thres,
            flag_col=self._name("INCREMENTS"),
        )
        return self

    def flag_hampel(self, window_length: int = 48, n_sigma: float = 5.5,
                    use_differencing: bool = False) -> "StepwiseScreening":
        self.df = outliers.flag_hampel(
            self.df, self.key_cols, self.ts_col, self.value_col,
            self.tier_seconds, window_length, n_sigma, use_differencing,
            flag_col=self._name("HAMPEL"),
        )
        return self

    def flag_local_sd(self, winsize: int | list[int] = 480,
                      n_sd: float | list[float] = 7.0,
                      constant_sd: bool = False) -> "StepwiseScreening":
        """LocalSD; a winsize LIST runs multiple passes (localsd.py:46
        winsize-list semantics), each pass testing the series with the
        previous passes' rejects nulled."""
        sizes = winsize if isinstance(winsize, list) else [winsize]
        nsds = n_sd if isinstance(n_sd, list) else [n_sd] * len(sizes)
        if len(nsds) != len(sizes):
            raise ValueError(
                f"winsize ({len(sizes)} passes) and n_sd ({len(nsds)}) "
                "lists must have equal length"
            )
        work = self.value_col
        for i, (w_, s_) in enumerate(zip(sizes, nsds)):
            name = self._name("LOCALSD")
            self.df = outliers.flag_local_sd(
                self.df, self.key_cols, self.ts_col, work,
                self.tier_seconds, w_, s_, constant_sd, flag_col=name,
            )
            if i < len(sizes) - 1:
                nxt = f"_lsd_work_{i}"
                self.df = self.df.withColumn(
                    nxt,
                    F.when(F.col(name) == 2, F.lit(None)).otherwise(F.col(work)),
                )
                work = nxt
        drop = [c for c in self.df.columns if c.startswith("_lsd_work_")]
        if drop:
            self.df = self.df.drop(*drop)
        return self

    def flag_lof(self, n_neighbors: int = 20, contamination: float | str = 0.01,
                 daytime_col: str | None = None, repeat: bool = False) -> "StepwiseScreening":
        from diive_spark.operators import lof as lof_mod
        name = self._name("LOF")
        if repeat:
            self.df = outliers.repeat_flag(
                self.df,
                lambda d, v: lof_mod.flag_lof(d, self.key_cols, self.ts_col, v,
                                              n_neighbors, contamination,
                                              daytime_col, flag_col=name),
                self.value_col, name,
            )
        else:
            self.df = lof_mod.flag_lof(
                self.df, self.key_cols, self.ts_col, self.value_col,
                n_neighbors, contamination, daytime_col, flag_col=name,
            )
        return self

    def flag_trim_low(self, trim_limit: float) -> "StepwiseScreening":
        self.df = outliers.flag_trim_low(
            self.df, self.key_cols, self.value_col, trim_limit,
            flag_col=self._name("TRIMLOW"),
        )
        return self

    def finalize(
        self,
        resample_tier: str | None = None,
        mincounts_perc: float = 0.0,
    ) -> DataFrame:
        """QCF + reject (null where QCF==2) + optional resample — the
        meteoscreening tail (meteoscreening.py:37, qcf.py:189-211)."""
        out = outliers.flag_qcf(self.df)
        cleaned = out.withColumn(
            f"{self.value_col}_CLEANED",
            F.when(F.col("FLAG_QCF") < 2, F.col(self.value_col)),
        )
        if resample_tier:
            return resample.rollup(
                cleaned.filter(F.col(f"{self.value_col}_CLEANED").isNotNull()),
                self.ts_col, [f"{self.value_col}_CLEANED"], resample_tier,
                key_cols=self.key_cols, mincounts_perc=mincounts_perc,
            )
        return cleaned
