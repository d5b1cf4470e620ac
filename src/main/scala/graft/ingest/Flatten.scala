package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema post-processing for JSON ingestion, mirroring the reference's
  * two modes (SURVEY.md §1.2):
  *
  *  - default mode stringifies every nested value
  *    (localsql/localsql.py:72-76) — [[stringifyNested]];
  *  - `-jn` normalize mode flattens nested objects into dotted column
  *    names `nest.a` (localsql/localsql.py:112-135, README.md:84-90) —
  *    [[flatten]].
  *
  * Both are pure projections (narrow, codegen'd, no shuffle) — unlike
  * the reference's row-at-a-time pd.concat loop, Spark flattens the
  * whole distributed dataset with one select.
  */
object Flatten {

  /** Replace struct/array/map columns with their JSON-text form.
    * Keeps scalar columns untouched. */
  def stringifyNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Recursively flatten StructType columns into dotted-name top-level
    * columns (`nest.a`, `nest.b.c`). Arrays are stringified (the
    * reference keeps lists as scalar values in normalize mode too). */
  def flatten(df: DataFrame): DataFrame = {
    def expand(prefix: String, field: StructField, path: Column): Seq[(String, Column)] =
      field.dataType match {
        case st: StructType =>
          st.fields.toIndexedSeq.flatMap { sub =>
            expand(s"$prefix.${sub.name}", sub, path.getField(sub.name))
          }
        case _: ArrayType | _: MapType => Seq(prefix -> to_json(path))
        case _ => Seq(prefix -> path)
      }
    val cols = df.schema.fields.toIndexedSeq.flatMap { f =>
      expand(f.name, f, col(s"`${f.name}`"))
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
