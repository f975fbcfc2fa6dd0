package graft.operators

import graft.functions.Fns
import graft.model.Ns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partial-precision date handling (SURVEY.md §2.8 F9/F10): the reference
  * parses a 13-format cascade into lexical date strings of varying precision
  * and tags the literal's datatype by LEXICAL LENGTH, explicitly never
  * normalizing `1891` to `1891-01-01` (`Utils/activity.py:40-73`,
  * `Utils/event.py:90-110`). It also expands a partial date to its interval
  * [start, end] (year → Jan 1 .. Dec 31 23:59:59; month → first .. last
  * second of the month; `Utils/activity.py:82-169`).
  *
  * Here each turn's ts is rendered at a precision chosen by event-id
  * arithmetic (the transcript analog of DATE/DATERANGE attributes), then
  * dispatched through formatDate and interval expansion — everything stays
  * in string space so nothing ever normalizes the partial forms.
  */
object Dates {
  import org.apache.spark.sql.Column

  /** Partial-precision lexical form of a timestamp; precision cycles with
    * (turn_idx % 4): 0→year, 1→month, 2→day, 3→datetime — the transcript
    * analog of DATE/DATERANGE attribute precision. */
  def lexicalOf(ts: Column, turnIdx: Column): Column = {
    val prec = turnIdx % 4
    when(prec === 0, date_format(ts, "yyyy"))
      .when(prec === 1, date_format(ts, "yyyy-MM"))
      .when(prec === 2, date_format(ts, "yyyy-MM-dd"))
      .otherwise(date_format(ts, "yyyy-MM-dd HH:mm:ss"))
  }

  /** First second covered by a partial lexical form (length-dispatched). */
  def intervalStart(lex: Column): Column =
    when(length(lex) === 4, concat(lex, lit("-01-01 00:00:00")))
      .when(length(lex) === 7, concat(lex, lit("-01 00:00:00")))
      .when(length(lex) === 10, concat(lex, lit(" 00:00:00")))
      .otherwise(lex)

  /** Last second covered by a partial lexical form. */
  def intervalEnd(lex: Column): Column =
    when(length(lex) === 4, concat(lex, lit("-12-31 23:59:59")))
      .when(length(lex) === 7,
        concat(date_format(last_day(to_date(concat(lex, lit("-01")))), "yyyy-MM-dd"),
          lit(" 23:59:59")))
      .when(length(lex) === 10, concat(lex, lit(" 23:59:59")))
      .otherwise(lex)

  /** transcripts+event arithmetic → (conv_id, turn_idx, lexical, dtype,
    * interval_start, interval_end). */
  def dateLiterals(transcripts: DataFrame): DataFrame = {
    val lex = lexicalOf(col("ts"), col("turn_idx"))
    val fd = Fns.formatDate(lex)
    transcripts.select(col("conv_id"), col("turn_idx"),
      fd.getField("lexical").as("lexical"),
      fd.getField("dtype").as("dtype"),
      intervalStart(lex).as("interval_start"), intervalEnd(lex).as("interval_end"))
  }
}
