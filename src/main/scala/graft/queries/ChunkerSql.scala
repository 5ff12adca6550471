package graft.queries

/** The reference chunker's iterative cut/overlap algorithm
  * (chunker.py:56-131) as a DuckDB recursive CTE — same normalize, same
  * whitespace-preferred cut, same forward-progress guards. Parameterized so
  * every oracle that chunks (q13 at 100/20, the ingest oracles at the
  * reference defaults 800/100) derives from ONE SQL formulation.
  */
object ChunkerSql {

  private def finExpr(start: String, size: Int): String = {
    val e0 = s"LEAST($start + $size, n)"
    val len = s"($e0 - $start)"
    val win = s"substr(t, $start + 1, $len)"
    val p = s"strpos(reverse($win), ' ')"
    s"""CASE WHEN $e0 >= n THEN n
        WHEN $p > 0 AND ($len - $p) > 0 THEN $start + ($len - $p)
        ELSE $e0 END"""
  }

  private def nextStart(step: Int): String =
    s"""CASE WHEN ns1 <= prev_start
        THEN (CASE WHEN prev_start >= 0 THEN prev_start + $step ELSE start + $step END)
        ELSE ns1 END"""

  /** A `WITH RECURSIVE … ` prefix ending in a `chunks(key, idx, chunk)`
    * CTE: the sliding-window chunks of each row of `srcSql`
    * (`SELECT … AS key, … AS text`). Append the final SELECT.
    */
  def walkCte(srcSql: String, size: Int, overlap: Int): String = {
    val step = size - overlap
    s"""WITH RECURSIVE src AS ($srcSql
       ), norm AS (
         SELECT key, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t FROM src
       ), base AS (
         SELECT key, t, length(t) AS n FROM norm WHERE length(t) > 0
       ), walk(key, t, n, start, prev_start, fin) AS (
         SELECT key, t, n, 0, -1, ${finExpr("0", size)} FROM base
         UNION ALL
         SELECT key, t, n, LEAST(${nextStart(step)}, n), start,
                ${finExpr(s"LEAST(${nextStart(step)}, n)", size)}
         FROM (
           SELECT key, t, n, start, prev_start, fin,
                  CASE WHEN fin - $overlap <= start THEN start + $step
                       ELSE fin - $overlap END AS ns1
           FROM walk WHERE fin < n
         ) s
       ), chunks AS (
         SELECT key,
                CAST(row_number() OVER (PARTITION BY key ORDER BY start) - 1 AS INT) AS idx,
                chunk
         FROM (SELECT key, start, trim(substr(t, start + 1, fin - start)) AS chunk FROM walk) c
         WHERE chunk <> ''
       )"""
  }
}
