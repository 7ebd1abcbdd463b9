package graft.search

import graft.core.Analyzer

/** The end-user "simple" query parser — a re-expression of
  * `lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/SimpleQueryParser.java:160`.
  * Its defining property is that it NEVER throws: any character sequence is
  * a valid program (unbalanced parens/quotes degrade to literal text,
  * dangling operators are ignored), which is what makes it safe to wire
  * directly to an end-user search box. Syntax (each feature behind the same
  * flag bits as the reference): `+` AND, `|` OR, `-` NOT (doubles cancel),
  * `"..."` phrase with `~N` slop, trailing `*` prefix, `term~N` fuzzy
  * (missing N = 2, capped at the reference's max edit distance 2),
  * `(...)` precedence, `\` escape, `*` alone = match-all.
  *
  * The query-tree builder is the reference's exact left-fold: an operation
  * CHANGE re-nests the accumulated tree as a single clause of a fresh
  * boolean, preserving the reference's precedence behavior; a negated
  * branch becomes `(MUST_NOT branch, SHOULD match-all)`. Single-field, like
  * graft's classic parser — cross-field composition is [[FlexibleParser]]'s
  * job. Pinned to the reference's own TestSimpleQueryParser vectors in
  * SimpleParserSpec. */
object SimpleParser {

  val AND_OPERATOR = 1 << 0
  val NOT_OPERATOR = 1 << 1
  val OR_OPERATOR = 1 << 2
  val PREFIX_OPERATOR = 1 << 3
  val PHRASE_OPERATOR = 1 << 4
  val PRECEDENCE_OPERATORS = 1 << 5
  val ESCAPE_OPERATOR = 1 << 6
  val WHITESPACE_OPERATOR = 1 << 7
  val FUZZY_OPERATOR = 1 << 8
  val NEAR_OPERATOR = 1 << 9
  val ALL_OPERATORS: Int = -1

  private val MaxEditDistance = 2 // LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE

  private final class State(val data: Array[Char], var index: Int, val length: Int) {
    var currentOperation: Option[Occur.Value] = None
    var previousOperation: Option[Occur.Value] = None
    var not: Int = 0
    var top: Query = _
  }

  def parse(queryText: String, analyzer: Analyzer,
            flags: Int = ALL_OPERATORS,
            defaultOperator: Occur.Value = Occur.SHOULD): Query = {
    require(defaultOperator == Occur.SHOULD || defaultOperator == Occur.MUST,
      "only SHOULD or MUST are allowed as the default operator")
    if (queryText.trim == "*") return MatchAllDocsQuery
    val state = new State(queryText.toCharArray, 0, queryText.length)
    parseSubQuery(state, analyzer, flags, defaultOperator)
    if (state.top == null) MatchNoDocsQuery else state.top
  }

  private def parseSubQuery(state: State, analyzer: Analyzer, flags: Int,
                            defaultOp: Occur.Value): Unit = {
    while (state.index < state.length) {
      val c = state.data(state.index)
      if (c == '(' && (flags & PRECEDENCE_OPERATORS) != 0) {
        consumeSubQuery(state, analyzer, flags, defaultOp)
      } else if (c == ')' && (flags & PRECEDENCE_OPERATORS) != 0) {
        state.index += 1 // extraneous, ignored
      } else if (c == '"' && (flags & PHRASE_OPERATOR) != 0) {
        consumePhrase(state, analyzer, flags, defaultOp)
      } else if (c == '+' && (flags & AND_OPERATOR) != 0) {
        if (state.currentOperation.isEmpty && state.top != null)
          state.currentOperation = Some(Occur.MUST)
        state.index += 1
      } else if (c == '|' && (flags & OR_OPERATOR) != 0) {
        if (state.currentOperation.isEmpty && state.top != null)
          state.currentOperation = Some(Occur.SHOULD)
        state.index += 1
      } else if (c == '-' && (flags & NOT_OPERATOR) != 0) {
        state.not += 1
        state.index += 1
        // `continue`: the not counter survives only across consecutive '-'
      } else if (isWs(c) && (flags & WHITESPACE_OPERATOR) != 0) {
        state.index += 1
      } else {
        consumeToken(state, analyzer, flags, defaultOp)
      }
      // the not counter survives ONLY across consecutive '-' (the
      // reference's `continue` before the loop-bottom reset)
      if (!(c == '-' && (flags & NOT_OPERATOR) != 0)) state.not = 0
    }
  }

  private def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def consumeSubQuery(state: State, analyzer: Analyzer, flags: Int,
                              defaultOp: Occur.Value): Unit = {
    state.index += 1
    val start = state.index
    var precedence = 1
    var escaped = false
    var done = false
    while (!done && state.index < state.length) {
      if (!escaped && state.data(state.index) == '\\' && (flags & ESCAPE_OPERATOR) != 0) {
        escaped = true
        state.index += 1
      } else {
        if (!escaped) {
          if (state.data(state.index) == '(') precedence += 1
          else if (state.data(state.index) == ')') {
            precedence -= 1
            if (precedence == 0) done = true
          }
        }
        escaped = false
        if (!done) state.index += 1
      }
    }
    if (state.index == state.length) {
      state.index = start // no closing paren: the opener was extraneous
    } else if (state.index == start) {
      state.currentOperation = None // immediate "()": drop pending operation
      state.index += 1
    } else {
      val sub = new State(state.data, start, state.index)
      parseSubQuery(sub, analyzer, flags, defaultOp)
      buildQueryTree(state, sub.top, defaultOp)
      state.index += 1
    }
  }

  private def consumePhrase(state: State, analyzer: Analyzer, flags: Int,
                            defaultOp: Occur.Value): Unit = {
    state.index += 1
    val start = state.index
    val buf = new StringBuilder
    var escaped = false
    var hasSlop = false
    var done = false
    while (!done && state.index < state.length) {
      if (!escaped && state.data(state.index) == '\\' && (flags & ESCAPE_OPERATOR) != 0) {
        escaped = true
        state.index += 1
      } else {
        if (!escaped && state.data(state.index) == '"') {
          if (state.length > state.index + 1 && state.data(state.index + 1) == '~' &&
              (flags & NEAR_OPERATOR) != 0) {
            state.index += 1
            if (state.length > state.index + 1) hasSlop = true
          }
          done = true
        } else {
          escaped = false
          buf.append(state.data(state.index))
          state.index += 1
        }
      }
    }
    if (!done) {
      state.index = start // no closing quote: the opener was extraneous
    } else if (buf.isEmpty && state.index == start) {
      state.currentOperation = None
      state.index += 1
    } else if (buf.isEmpty) {
      state.currentOperation = None
      state.index += 1
    } else {
      val slop = if (hasSlop) parseFuzziness(state, flags) else 0
      buildQueryTree(state, newPhraseQuery(buf.toString, slop, analyzer), defaultOp)
      state.index += 1
    }
  }

  private def consumeToken(state: State, analyzer: Analyzer, flags: Int,
                           defaultOp: Occur.Value): Unit = {
    val buf = new StringBuilder
    var escaped = false
    var prefix = false
    var fuzzy = false
    var done = false
    while (!done && state.index < state.length) {
      if (!escaped && state.data(state.index) == '\\' && (flags & ESCAPE_OPERATOR) != 0) {
        escaped = true
        prefix = false
        state.index += 1
      } else {
        if (!escaped) {
          if (tokenFinished(state, flags)) { done = true }
          else if (buf.nonEmpty && state.data(state.index) == '~' &&
                   (flags & FUZZY_OPERATOR) != 0) { fuzzy = true; done = true }
        }
        if (!done) {
          if (!escaped)
            prefix = buf.nonEmpty && state.data(state.index) == '*' &&
              (flags & PREFIX_OPERATOR) != 0
          escaped = false
          buf.append(state.data(state.index))
          state.index += 1
        }
      }
    }
    if (buf.nonEmpty) {
      val branch: Query =
        if (fuzzy) {
          val token = buf.toString
          val f = math.min(parseFuzziness(state, flags), MaxEditDistance)
          if (f == 0) newDefaultQuery(token, analyzer, defaultOp)
          else FuzzyQuery(normalize(token, analyzer), f)
        } else if (prefix) {
          PrefixQuery(normalize(buf.substring(0, buf.length - 1), analyzer))
        } else {
          newDefaultQuery(buf.toString, analyzer, defaultOp)
        }
      buildQueryTree(state, branch, defaultOp)
    }
  }

  /** `Analyzer.normalize` analog for non-tokenized operators (prefix/fuzzy
    * text may contain characters the tokenizer would split on). */
  private def normalize(text: String, analyzer: Analyzer): String =
    text.toLowerCase(java.util.Locale.ROOT)

  /** `createBooleanQuery`: the analyzed tokens under the default operator. */
  private def newDefaultQuery(text: String, analyzer: Analyzer,
                              defaultOp: Occur.Value): Query =
    analyzer.tokenize(text).map(_.term) match {
      case Seq() => null
      case Seq(t) => TermQuery(t)
      case ts => BooleanQuery(ts.map(t => (defaultOp, TermQuery(t))))
    }

  /** `createPhraseQuery`: one analyzed token degrades to a term. */
  private def newPhraseQuery(text: String, slop: Int, analyzer: Analyzer): Query =
    analyzer.tokenize(text).map(_.term) match {
      case Seq() => null
      case Seq(t) => TermQuery(t)
      case ts => PhraseQuery(ts, slop)
    }

  private def tokenFinished(state: State, flags: Int): Boolean = {
    val c = state.data(state.index)
    (c == '"' && (flags & PHRASE_OPERATOR) != 0) ||
    (c == '|' && (flags & OR_OPERATOR) != 0) ||
    (c == '+' && (flags & AND_OPERATOR) != 0) ||
    (c == '(' && (flags & PRECEDENCE_OPERATORS) != 0) ||
    (c == ')' && (flags & PRECEDENCE_OPERATORS) != 0) ||
    (isWs(c) && (flags & WHITESPACE_OPERATOR) != 0)
  }

  /** `parseFuzziness`: digits after `~`; missing = 2, unparsable/negative = 0. */
  private def parseFuzziness(state: State, flags: Int): Int = {
    if (state.index >= state.length || state.data(state.index) != '~') return 0
    val buf = new StringBuilder
    var done = false
    while (!done && state.index < state.length) {
      state.index += 1
      if (state.index < state.length) {
        if (tokenFinished(state, flags)) done = true
        else buf.append(state.data(state.index))
      }
    }
    if (buf.isEmpty) 2
    else
      try math.max(0, buf.toString.toInt)
      catch { case _: NumberFormatException => 0 }
  }

  /** The reference's left-fold tree builder (`buildQueryTree:449`): negation
    * wraps the branch; an operation change re-nests the accumulated top. */
  private def buildQueryTree(state: State, branch0: Query, defaultOp: Occur.Value): Unit = {
    if (branch0 == null) return
    var branch = branch0
    if (state.not % 2 == 1)
      branch = BooleanQuery(Seq(Occur.MUST_NOT -> branch, Occur.SHOULD -> MatchAllDocsQuery))
    if (state.top == null) {
      state.top = branch
    } else {
      if (state.currentOperation.isEmpty) state.currentOperation = Some(defaultOp)
      val op = state.currentOperation.get
      if (!state.previousOperation.contains(op))
        state.top = BooleanQuery(Seq(op -> state.top))
      state.top = state.top match {
        case BooleanQuery(clauses, msm) => BooleanQuery(clauses :+ (op -> branch), msm)
        case other => BooleanQuery(Seq(op -> other, op -> branch))
      }
      state.previousOperation = Some(op)
    }
    state.currentOperation = None
  }
}
