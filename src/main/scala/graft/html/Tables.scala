package graft.html

import scala.collection.mutable

/** Structured table extraction: every `<table>`'s cells as
  * (table_idx, row_idx, col_idx, is_header, text) rows — the surface
  * table-to-text / table-QA corpora are built from, and the structured twin
  * of [[Boilerplate]]'s layout rendering (which linearizes a row as
  * `"a | b"` for the plain-text corpus). ADDITIVE surface — the reference
  * has no HTML code.
  *
  * Semantics:
  *  - `table_idx` is the order of `<table>` OPEN tags in the document
  *    (0-based), so nested tables get their own index;
  *  - a nested table's content belongs to the NESTED table's cells only:
  *    the containing cell's text pauses at the inner `<table>` and resumes
  *    after its `</table>` (no text is duplicated and none is lost);
  *  - `row_idx` counts `<tr>` opens per table; a cell arriving before any
  *    `<tr>` (markup in the wild omits it) opens implied row 0;
  *  - `col_idx` counts `td`/`th` opens per row — implied closes follow
  *    HTML5 tree construction: a new `td`/`th`/`tr` or a table close ends
  *    the open cell, EOF closes everything (truncated pages still yield
  *    their cells);
  *  - empty cells are STRUCTURE (column alignment) and are emitted with
  *    `text == ""`;
  *  - `<caption>`, `<thead>`/`<tbody>`/`<tfoot>` and inter-cell whitespace
  *    are transparent — caption text is not a cell;
  *  - cell text uses [[Links.innerText]]: inline tags transparent, `<br>`
  *    separates words, entities decoded, comments/CDATA/raw-text bodies
  *    skipped — and the walk itself is [[Meta.walkTagsAt]], so a `<td>`
  *    forged inside `<script>` or a comment can neither open a cell nor
  *    leak text.
  *
  * A per-row projection: ZERO shuffles at any corpus size. */
object Tables {

  /** One emitted cell. `header` marks `<th>` cells. */
  final case class TableCell(tableIdx: Int, rowIdx: Int, colIdx: Int,
      header: Boolean, text: String)

  /** All cells of all tables. Emission order is cell-CLOSE order (a nested
    * table's cells close before their containing cell) — callers wanting
    * document layout sort by (tableIdx, rowIdx, colIdx). */
  def cells(html: String): Seq[TableCell] = {
    // one open cell per table on the stack at most; text accumulates as raw
    // [from, until) segments so a nested table can pause/resume the
    // containing cell without a second scanner
    final class OpenCell(val row: Int, val col: Int, val header: Boolean) {
      val segs = mutable.ArrayBuffer.empty[(Int, Int)]
      var segStart: Int = -1 // -1 = paused (inside a nested table)
    }
    final class Tbl(val idx: Int) {
      var row: Int = -1
      var col: Int = -1
      var cell: OpenCell = null
    }
    val out = Vector.newBuilder[TableCell]
    val stack = mutable.ArrayBuffer.empty[Tbl]
    var nTables = 0
    def top: Tbl = stack(stack.length - 1)
    def endSeg(t: Tbl, pos: Int): Unit = {
      val c = t.cell
      if (c != null && c.segStart >= 0) {
        if (pos > c.segStart) c.segs += ((c.segStart, pos))
        c.segStart = -1
      }
    }
    def closeCell(t: Tbl, pos: Int): Unit = {
      val c = t.cell
      if (c != null) {
        endSeg(t, pos)
        val text = c.segs.iterator
          .map { case (a, b) => Links.innerText(html, a, b) }
          .filter(_.nonEmpty).mkString(" ")
        out += TableCell(t.idx, c.row, c.col, c.header, text)
        t.cell = null
      }
    }
    Meta.walkTagsAt(html) { (name0, _, tagStart, afterTag) =>
      // tagName keeps an XHTML self-close slash in the name ("td/") — fold
      // it onto the open form: HTML5 tree construction IGNORES the
      // self-closing slash on non-void elements, so <td/> opens a cell
      // that runs to the next boundary, exactly like <td>
      val name = name0.stripSuffix("/")
      name match {
        case "table" =>
          if (stack.nonEmpty) endSeg(top, tagStart) // containing cell pauses
          stack += new Tbl(nTables)
          nTables += 1
        case "/table" =>
          if (stack.nonEmpty) {
            closeCell(top, tagStart)
            stack.remove(stack.length - 1)
            // containing cell resumes after the inner table's close tag
            if (stack.nonEmpty) {
              val c = top.cell
              if (c != null && c.segStart < 0) c.segStart = afterTag
            }
          }
        case "tr" =>
          if (stack.nonEmpty) {
            val t = top
            closeCell(t, tagStart)
            t.row += 1
            t.col = -1
          }
        case "/tr" =>
          if (stack.nonEmpty) closeCell(top, tagStart)
        case "td" | "th" =>
          if (stack.nonEmpty) {
            val t = top
            closeCell(t, tagStart) // implied close of the previous cell
            if (t.row < 0) t.row = 0 // implied <tr>
            t.col += 1
            val c = new OpenCell(t.row, t.col, name == "th")
            c.segStart = afterTag
            t.cell = c
          }
        case "/td" | "/th" =>
          if (stack.nonEmpty) closeCell(top, tagStart)
        case _ => // thead/tbody/tfoot/caption and everything else: transparent
      }
    }
    // EOF closes anything still open (truncated / unclosed markup)
    while (stack.nonEmpty) {
      closeCell(top, html.length)
      stack.remove(stack.length - 1)
    }
    out.result()
  }

  def cells(bytes: Array[Byte]): Seq[TableCell] =
    cells(Boilerplate.decode(bytes))
}
