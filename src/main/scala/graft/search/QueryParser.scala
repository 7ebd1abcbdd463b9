package graft.search

import graft.core.Analyzer

/** Classic query-syntax parser — the textual front-end of the reference
  * (`lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/QueryParser.java:82`,
  * `QueryParserBase.java:133,366-405`), re-implemented from the published
  * syntax for the single-indexed-field engine. Supported subset (SURVEY.md §3.3):
  *
  *  - bare terms (analyzed): `spark data`
  *  - `+must`, `-must_not` prefixes; `AND` / `&&`, `OR` / `||`, `NOT` / `!`
  *    connectives with the classic parser's left-to-right clause mutation
  *    (an `AND` upgrades the previous default-SHOULD clause to MUST)
  *  - phrases: `"exact phrase"` (analyzed; multi-token terms inside quotes)
  *  - fuzzy: `term~`, `term~1`, `term~2`
  *  - wildcard: `te?t`, `test*`, `te*t` (leading wildcards allowed)
  *  - regexp: `/pattern/`
  *  - ranges: `[a TO b]` inclusive, `{a TO b}` exclusive, mixed `[a TO b}`,
  *    open ends via `*`
  *  - boosts: `term^2`, `"phrase"^0.5`, `(group)^3`
  *  - grouping: `(a OR b) AND c`
  *  - field prefixes `field:` are accepted and ignored (one indexed field)
  *
  * A term that analyzes to multiple tokens becomes a phrase (the classic
  * parser's behavior for analyzers that split); one that analyzes to nothing
  * (stopword) is dropped.
  */
object QueryParser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  def parse(input: String, analyzer: Analyzer): Query = {
    val tokens = lex(input)
    val (q, rest) = parseClauses(tokens, analyzer)
    if (rest.nonEmpty) throw ParseException(s"unexpected trailing input: ${rest.head}")
    q
  }

  // --------------------------------------------------------------- lexer

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndOp extends Tok
  private case object OrOp extends Tok
  private case object NotOp extends Tok
  private case object Plus extends Tok
  private case object Minus extends Tok
  private final case class Phrase(s: String, slop: Int, boost: Option[Float]) extends Tok
  private final case class Regex(s: String, boost: Option[Float]) extends Tok
  private final case class Range(lo: String, hi: String, incLo: Boolean, incHi: Boolean,
                                 boost: Option[Float]) extends Tok
  private final case class Word(s: String, fuzzy: Option[Int], boost: Option[Float]) extends Tok
  private final case class GroupBoost(b: Float) extends Tok // ^n immediately after ')'

  private def lex(in: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = in.length
    def readBoost(): Option[Float] =
      if (i < n && in.charAt(i) == '^') {
        i += 1
        val s = i
        while (i < n && (in.charAt(i).isDigit || in.charAt(i) == '.')) i += 1
        if (i == s) throw ParseException("dangling ^")
        val str = in.substring(s, i)
        try Some(str.toFloat)
        catch { case _: NumberFormatException => throw ParseException(s"bad boost: $str") }
      } else None
    while (i < n) {
      val c = in.charAt(i)
      if (c.isWhitespace) i += 1
      else c match {
        case '(' => out += LParen; i += 1
        case ')' =>
          i += 1
          readBoost() match {
            case Some(b) => out += RParen += GroupBoost(b)
            case None => out += RParen
          }
        case '+' => out += Plus; i += 1
        case '-' => out += Minus; i += 1
        case '!' => out += NotOp; i += 1
        case '&' if i + 1 < n && in.charAt(i + 1) == '&' => out += AndOp; i += 2
        case '|' if i + 1 < n && in.charAt(i + 1) == '|' => out += OrOp; i += 2
        case '"' =>
          val close = in.indexOf('"', i + 1)
          if (close < 0) throw ParseException("unterminated phrase")
          val body = in.substring(i + 1, close)
          i = close + 1
          // optional slop: "a b"~2 (the classic syntax's proximity suffix)
          val slop =
            if (i < n && in.charAt(i) == '~') {
              i += 1
              val ds = i
              while (i < n && in.charAt(i).isDigit) i += 1
              if (i == ds) throw ParseException("dangling ~ after phrase")
              in.substring(ds, i).toInt
            } else 0
          out += Phrase(body, slop, readBoost())
        case '/' =>
          val close = in.indexOf('/', i + 1)
          if (close < 0) throw ParseException("unterminated regexp")
          val body = in.substring(i + 1, close)
          i = close + 1
          out += Regex(body, readBoost())
        case '[' | '{' =>
          val incLo = c == '['
          val closeB = in.indexWhere(ch => ch == ']' || ch == '}', i + 1)
          if (closeB < 0) throw ParseException("unterminated range")
          val incHi = in.charAt(closeB) == ']'
          val body = in.substring(i + 1, closeB)
          val parts = body.split("\\s+TO\\s+")
          if (parts.length != 2) throw ParseException(s"bad range: [$body]")
          i = closeB + 1
          out += Range(parts(0).trim, parts(1).trim, incLo, incHi, readBoost())
        case _ =>
          val s = i
          while (i < n && !in.charAt(i).isWhitespace &&
                 !"()\"^+[{".contains(in.charAt(i)) &&
                 !(in.charAt(i) == '~')) i += 1
          var w = in.substring(s, i)
          // field prefix: accepted, stripped (single-field engine); a word
          // that is ONLY a field prefix (`text:` before `"..."`, `[..]`, `(`)
          // attaches to the next token — drop it here
          if (w.nonEmpty && w.last == ':' && i < n &&
              "\"[{(/".contains(in.charAt(i))) {
            // skip emitting; the following token is the field's value
          } else {
          val colon = w.indexOf(':')
          if (colon > 0 && colon < w.length - 1) w = w.substring(colon + 1)
          w match {
            case "AND" => out += AndOp
            case "OR" => out += OrOp
            case "NOT" => out += NotOp
            case _ =>
              val fuzzy: Option[Int] =
                if (i < n && in.charAt(i) == '~') {
                  i += 1
                  val ds = i
                  while (i < n && in.charAt(i).isDigit) i += 1
                  Some(if (i > ds) in.substring(ds, i).toInt else 2)
                } else None
              out += Word(w, fuzzy, readBoost())
          }
          }
      }
    }
    out.result()
  }

  // -------------------------------------------------------------- parser

  private final case class Clause(occur: Occur.Value, explicit0: Boolean, q: Query)

  /** Parse a clause sequence until `)` or end, applying the classic parser's
    * left-to-right connective mutation (`QueryParserBase.addClause:366-405`). */
  private def parseClauses(toks: List[Tok], analyzer: Analyzer): (Query, List[Tok]) = {
    var rest = toks
    val clauses = scala.collection.mutable.ArrayBuffer.empty[Clause]
    var pendingOccur: Option[Occur.Value] = None
    var pendingConj: Option[Tok] = None // AndOp / OrOp

    def addClause(q: Query): Unit = {
      val occur = pendingOccur.getOrElse {
        pendingConj match {
          case Some(AndOp) => Occur.MUST
          case _ => Occur.SHOULD
        }
      }
      // `a AND b`: upgrade the previous default-SHOULD clause to MUST
      if (pendingConj.contains(AndOp) && clauses.nonEmpty) {
        val last = clauses.last
        if (!last.explicit0 && last.occur == Occur.SHOULD)
          clauses(clauses.length - 1) = last.copy(occur = Occur.MUST)
      }
      clauses += Clause(occur, pendingOccur.isDefined, q)
      pendingOccur = None
      pendingConj = None
    }

    while (rest.nonEmpty && rest.head != RParen) {
      rest.head match {
        case Plus => pendingOccur = Some(Occur.MUST); rest = rest.tail
        case Minus | NotOp => pendingOccur = Some(Occur.MUST_NOT); rest = rest.tail
        case AndOp => pendingConj = Some(AndOp); rest = rest.tail
        case OrOp => pendingConj = Some(OrOp); rest = rest.tail
        case LParen =>
          val (inner, r2) = parseClauses(rest.tail, analyzer)
          r2 match {
            case RParen :: GroupBoost(b) :: r3 => addClause(BoostQuery(inner, b)); rest = r3
            case RParen :: r3 => addClause(inner); rest = r3
            case _ => throw ParseException("missing )")
          }
        case Phrase(body, slop, boost) =>
          val terms = analyzer.tokenize(body).map(_.term)
          val q: Query =
            if (terms.isEmpty) MatchNoDocsQuery
            else if (terms.size == 1) TermQuery(terms.head)
            else PhraseQuery(terms, slop)
          addClause(boost.fold(q)(b => BoostQuery(q, b)))
          rest = rest.tail
        case Regex(body, boost) =>
          addClause(boost.fold[Query](RegexpQuery(body))(b => BoostQuery(RegexpQuery(body), b)))
          rest = rest.tail
        case Range(lo, hi, il, ih, boost) =>
          val loOpt = if (lo == "*") None else Some(analyzeAtom(lo, analyzer))
          val hiOpt = if (hi == "*") None else Some(analyzeAtom(hi, analyzer))
          val q = TermRangeQuery(loOpt, hiOpt, il, ih)
          addClause(boost.fold[Query](q)(b => BoostQuery(q, b)))
          rest = rest.tail
        case Word(w, fuzzy, boost) =>
          val q: Query = fuzzy match {
            case Some(maxE) => FuzzyQuery(analyzeAtom(w, analyzer), maxE)
            case None =>
              if (w.exists(c => c == '*' || c == '?'))
                WildcardQuery(w.toLowerCase(java.util.Locale.ROOT))
              else {
                val terms = analyzer.tokenize(w).map(_.term)
                if (terms.isEmpty) MatchNoDocsQuery
                else if (terms.size == 1) TermQuery(terms.head)
                else PhraseQuery(terms)
              }
          }
          addClause(boost.fold(q)(b => BoostQuery(q, b)))
          rest = rest.tail
        case t => throw ParseException(s"unexpected token $t")
      }
    }
    if (pendingOccur.isDefined || pendingConj.isDefined)
      throw ParseException("dangling operator")

    val q: Query = clauses.toList match {
      case Nil => MatchNoDocsQuery
      case Clause(Occur.SHOULD, _, single) :: Nil => single
      case Clause(Occur.MUST, false, single) :: Nil => single
      case cs => BooleanQuery(cs.map(c => c.occur -> c.q))
    }
    (q, rest)
  }

  /** Analyze a single atomic term (range endpoint, fuzzy base): lowercase via
    * the analyzer; falls back to raw lowercase if analysis drops it. */
  private def analyzeAtom(w: String, analyzer: Analyzer): String = {
    val toks = analyzer.tokenize(w)
    if (toks.nonEmpty) toks.head.term else w.toLowerCase(java.util.Locale.ROOT)
  }
}
