package graft.sparql

import graft.model.Iri

/**
 * Rewrites a SPARQL Update request so the SPARQL-protocol dataset
 * parameters (`using-graph-uri` / `using-named-graph-uri`, protocol §2.2.3)
 * are spelled as USING / USING NAMED clauses IN THE REQUEST TEXT.
 *
 * Why text, not a side channel: a write-ahead log ([[graft.UpdateLog]])
 * replays request text, and anything living outside the text (URL
 * parameters) would be silently lost on replay — the replayed store would
 * evaluate the WHERE clauses against a different dataset than the live one
 * did. Splicing the clauses in makes every log entry self-contained: the
 * live apply and any future replay execute the IDENTICAL text through the
 * IDENTICAL path.
 *
 * The transform (performed on a lexical scan that is comment-, string-,
 * and IRI-aware, so braces or keywords inside literals cannot confuse it):
 *   - every top-level `WHERE` of a Modify operation gets the USING clauses
 *     inserted immediately before it (grammar: `Modify ::= (WITH iri)?
 *     (DeleteClause InsertClause? | InsertClause) UsingClause* 'WHERE'
 *     GroupGraphPattern`);
 *   - `DELETE WHERE { G }` has no UsingClause slot, so it becomes its
 *     spec-equivalent `DELETE { G } USING … WHERE { G }` (Update §3.1.3.3:
 *     DELETE WHERE is shorthand for a Modify whose delete template and
 *     pattern coincide).
 * Operations without a WHERE (data ops, LOAD, CLEAR-family, …) do not use
 * the protocol dataset and pass through untouched.
 *
 * Callers must reject requests whose operations already carry USING or
 * WITH before splicing (the protocol makes that combination an error, and
 * [[graft.engine.UpdateExec]] enforces it); this rewriter assumes every
 * top-level WHERE belongs to an operation without dataset clauses.
 */
object UpdateDatasetRewrite {

  def spliceUsing(text: String, usingDefault: Seq[Iri], usingNamed: Seq[Iri]): String = {
    if (usingDefault.isEmpty && usingNamed.isEmpty) return text
    val clauses = (usingDefault.map(i => s"USING <${i.value}>") ++
      usingNamed.map(i => s"USING NAMED <${i.value}>")).mkString(" ")
    val out = new java.lang.StringBuilder(text.length + clauses.length * 2 + 16)
    val n = text.length
    var i = 0
    var depth = 0
    var prevWord = "" // previous significant depth-0 token, "" unless a word

    /** End index (exclusive) of the lexical token starting at `from`:
      * comments, strings (single/triple, both quote chars, escapes), and
      * IRIREFs are skipped whole so their contents can't be mistaken for
      * structure. Returns from+1 for ordinary single characters. */
    def tokenEnd(from: Int): Int = text.charAt(from) match {
      case '#' =>
        var j = from
        while (j < n && text.charAt(j) != '\n') j += 1
        j
      case q @ ('\'' | '"') =>
        val triple = from + 2 < n && text.charAt(from + 1) == q && text.charAt(from + 2) == q
        var j = from + (if (triple) 3 else 1)
        var done = false
        while (j < n && !done) {
          val c = text.charAt(j)
          if (c == '\\' && j + 1 < n) j += 2
          else if (c == q && (!triple ||
            (j + 2 < n && text.charAt(j + 1) == q && text.charAt(j + 2) == q))) {
            j += (if (triple) 3 else 1); done = true
          } else j += 1
        }
        j
      case '<' =>
        // IRIREF attempt: its alphabet excludes <>"{}|^`\ and whitespace, so
        // the attempt can never run past a brace or quote; no closing '>'
        // before an illegal char means this '<' was an operator — 1 char.
        var j = from + 1
        while (j < n && !"<>\"{}|^`\\'".contains(text.charAt(j)) &&
          !text.charAt(j).isWhitespace) j += 1
        if (j < n && text.charAt(j) == '>') j + 1 else from + 1
      case c if c.isLetter || c == '_' =>
        var j = from
        while (j < n && (text.charAt(j).isLetterOrDigit || text.charAt(j) == '_')) j += 1
        j
      case _ => from + 1
    }

    /** Index just past the `}` matching the `{` at `open`. */
    def groupEnd(open: Int): Int = {
      var j = open
      var d = 0
      while (j < n) {
        text.charAt(j) match {
          case '{' => d += 1; j += 1
          case '}' =>
            d -= 1; j += 1
            if (d == 0) return j
          case _ => j = tokenEnd(j)
        }
      }
      throw new IllegalArgumentException("unbalanced braces in update request")
    }

    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace || c == '#') { // trivia: copy, keep prevWord
        val e = if (c == '#') tokenEnd(i) else i + 1
        out.append(text, i, e); i = e
      } else if (c == '{') { depth += 1; prevWord = ""; out.append(c); i += 1 }
      else if (c == '}') { depth -= 1; prevWord = ""; out.append(c); i += 1 }
      else if (depth > 0) { val e = tokenEnd(i); out.append(text, i, e); i = e }
      else {
        val e = tokenEnd(i)
        val word = text.substring(i, e)
        // a keyword is a bare word: `ex:WHERE` (local name) and `WHERE:`
        // (prefix label) are names, not keywords
        val isKeyword = (c.isLetter || c == '_') &&
          (i == 0 || text.charAt(i - 1) != ':') && (e >= n || text.charAt(e) != ':')
        if (isKeyword && word.equalsIgnoreCase("WHERE")) {
          if (prevWord == "DELETE") {
            // DELETE WHERE { G }  →  { G } USING … WHERE { G }
            var j = e
            while (j < n && (text.charAt(j).isWhitespace || text.charAt(j) == '#'))
              j = if (text.charAt(j) == '#') tokenEnd(j) else j + 1
            if (j >= n || text.charAt(j) != '{')
              throw new IllegalArgumentException("DELETE WHERE without a quad pattern group")
            val ge = groupEnd(j)
            val group = text.substring(j, ge)
            out.append(group).append(' ').append(clauses).append(" WHERE ").append(group)
            i = ge
          } else {
            out.append(clauses).append(' ').append(word)
            i = e
          }
          prevWord = ""
        } else {
          out.append(text, i, e)
          prevWord = if (isKeyword) word.toUpperCase else ""
          i = e
        }
      }
    }
    out.toString
  }
}
