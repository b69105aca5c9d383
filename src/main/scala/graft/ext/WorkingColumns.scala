package graft.ext

import org.apache.spark.sql.DataFrame

/** Naming discipline for operator temporaries that ride on a CALLER-supplied
  * frame. Most operators isolate their working columns behind an internal
  * projection, where no collision is possible; the few that decorate the
  * caller's frame in place (dedupAgainst's hash, shuffleShards' rank key,
  * repetition's token count, stripDuplicateSpans' token scratch) must not
  * silently replace-and-drop a caller column that happens to share the
  * `__`-prefixed name.
  */
private[graft] object WorkingColumns {

  /** A working-column name that does not collide with any column of `df`:
    * `base` itself when free, else `base1`, `base2`, …
    */
  def fresh(df: DataFrame, base: String): String =
    if (!df.columns.contains(base)) base
    else Iterator.from(1).map(i => s"$base$i")
      .find(n => !df.columns.contains(n)).get
}
