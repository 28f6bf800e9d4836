package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

import graft.core.Naming

/** The reference's per-row transform chain, recast as plan-time column
  * operations (zero per-row interpretation — everything below is resolved
  * during analysis or runs as codegen'd expressions):
  *
  *   - R3 header sanitization (`app.py:129`, `functions.py:5-20`):
  *     pure rename on `df.columns`.
  *   - R4 projection-by-membership (`app.py:130`): keep only columns whose
  *     sanitized name is in the target schema; silently drop the rest.
  *     Missing columns become typed nulls (the reference leaves the key
  *     absent from the row dict — Spark's fixed-schema equivalent is null).
  *   - R5 empty-string → null (`app.py:131`): `nullif(col, '')`.
  *   - Duplicate sanitized names: the reference's dict assignment makes the
  *     LAST occurrence win (`app.py:128-131`); we match that.
  */
object Canonicalize {

  /** Backtick-quote a raw column name so `.` / `!` etc. are literal. */
  private def quoted(name: String): String = "`" + name.replace("`", "``") + "`"

  /** R3: sanitize+lower every column name (rename only, last-dup wins).
    * Positional `toDF` rename — no name resolution on messy headers. */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns.map(Naming.sanitizeLower)
    val lastIdx = renamed.zipWithIndex.groupBy(_._1).map { case (n, xs) => n -> xs.last._2 }
    val keepIdx = renamed.indices.filter(i => lastIdx(renamed(i)) == i)
    df.select(keepIdx.map(i => col(quoted(df.columns(i)))): _*)
      .toDF(keepIdx.map(renamed): _*)
  }

  /** R5: any empty string value becomes null (string columns only). */
  def nullifyEmpty(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) nullif(col(f.name), lit("")).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** R3+R4+R5 against an ordered column list (all-strings canonical frame). */
  def apply(df: DataFrame, schemaCols: Seq[String]): DataFrame = {
    val sane = sanitizeColumns(df)
    val present = sane.columns.toSet
    val projected = sane.select(schemaCols.map { c =>
      if (present(c)) col(c) else lit(null).cast(StringType).as(c)
    }: _*)
    nullifyEmpty(projected)
  }

  /** Full chain against a typed StructType: R3+R4+R5 then the intended
    * casts (`settings.py:30-36`). `try_cast` semantics — non-numeric
    * strings become null instead of failing (ANSI-safe). */
  def apply(df: DataFrame, schema: StructType): DataFrame = {
    val strings = apply(df, schema.fieldNames.toSeq)
    val cast = schema.fields.map { f =>
      if (f.dataType == StringType) col(f.name)
      else col(f.name).try_cast(f.dataType).as(f.name)
    }
    strings.select(cast.toIndexedSeq: _*)
  }
}
