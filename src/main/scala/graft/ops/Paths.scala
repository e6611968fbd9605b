package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path → key projections (SURVEY.md §2.3 P1).
  *
  * Reference semantics (`/root/reference/dataruu/run.py:49-52`,
  * `legacy/prepare_aesthetic_tags_metadata.py:39`): image key =
  * basename(path) → strip the LAST extension → take the prefix before the
  * FIRST `_` (in that order, like `os.path.splitext` + `split('_')[0]`).
  * Pure string builtins — stays inside whole-stage codegen, no UDF, and
  * each step has an exact DuckDB spelling for the oracle.
  */
object Paths {
  /** Basename including extension. */
  def baseName(path: Column): Column =
    regexp_replace(path, "^.*/", "")

  /** Basename with the last `.ext` stripped (Python `splitext` behavior
    * for ordinary names). */
  def stripExt(name: Column): Column =
    regexp_replace(name, "\\.[^.]*$", "")

  /** `"/data/img/123_tail.v2.jpg"` → `"123"`; `"/d/a.b.png"` → `"a.b"`. */
  def imageKey(path: Column): Column =
    substring_index(stripExt(baseName(path)), "_", 1)

  /** Directory part of a path (no trailing slash). */
  def dirName(path: Column): Column =
    regexp_extract(path, "^(.*)/[^/]*$", 1)

  /** Lower-cased extension without the dot. */
  def extension(path: Column): Column =
    lower(regexp_extract(path, "\\.([^./]+)$", 1))

  /** Sidecar path `{dir}/{key}.{ext}` for an image path — the reference
    * reads `{id}.txt` / `{id}.caption` next to `{id}_*.jpg`
    * (`dataruu/run.py:53-57`, `legacy/merge_all_to_metadata.py:133-139`). */
  def sidecarPath(path: Column, ext: String): Column =
    concat(dirName(path), lit("/"), imageKey(path), lit("." + ext))
}
