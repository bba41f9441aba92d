package graft.cli

import graft.InvalidOption

/** Usage-grammar and argument parsing — a faithful port of the reference's
  * CLI API definition mechanism (reference: gluettalax.py:566-635, A19/A20).
  *
  * Grammar (one usage line): `<req>` required positional, `[opt]` optional
  * positional, `[--k=v]` valued option, `[--k]` boolean flag.
  *
  * Parsing semantics preserved exactly (the 14 cases in the reference's
  * test_parse_args.py are the compat spec, ported to ArgParserSpec):
  *   - both `--k=v` and `--k v` accepted (split-and-reinsert);
  *   - boolean flags stored as `op_<k> -> true`;
  *   - unknown `--key` is accepted as a valued option (free-form job params,
  *     gluettalax.py:618-622);
  *   - missing value / missing required / non-dash junk → InvalidOption;
  *   - missing optional positionals padded with None.
  */
object ArgParser {

  /** Parsed usage line: required positionals, optional positionals, and
    * option name → isBooleanFlag. */
  final case class Usage(
      required: List[String],
      optionals: List[String],
      options: Map[String, Boolean])

  /** Parse result: positional values in declaration order (None where an
    * optional positional was omitted) and the keyword-argument map. Values
    * parsed from the command line are Strings; defaults keep their original
    * type (matching the reference, where an int default survives untouched).
    */
  final case class ParsedArgs(
      positionals: List[Option[String]],
      kargs: Map[String, Any]) {
    /** Convenience for single-positional commands. */
    def positional1: Option[String] = positionals.headOption.flatten
  }

  /** reference: gluettalax.py:566-587 */
  def parseUsage(usage: String): Usage = {
    val items = usage.split('\n').head.split("\\s+").filter(_.nonEmpty)
    var required = List.empty[String]
    var optionals = List.empty[String]
    var options = Map.empty[String, Boolean]
    items.foreach { item0 =>
      if (!item0.startsWith("[")) required :+= item0
      else {
        val item = item0.stripPrefix("[").stripSuffix("]")
        if (item.nonEmpty && item.charAt(0) != '-') optionals :+= item
        else {
          val name0 = item.dropWhile(_ == '-')
          if (name0.contains('=')) options += (name0.split('=').head -> false)
          else options += (name0 -> true)
        }
      }
    }
    Usage(required, optionals, options)
  }

  /** reference: gluettalax.py:590-635 */
  def parseArgs(
      args: Seq[String],
      usage: String,
      defaults: Map[String, Any] = Map.empty): ParsedArgs = {
    val parsed = parseUsage(usage)
    var required = parsed.required
    var optionals = parsed.optionals
    val nPositionals = parsed.required.size + parsed.optionals.size
    var result = List.empty[Option[String]]
    var kargs: Map[String, Any] = defaults
    var opt: Option[String] = None
    // args(0) is the command name
    var rest: List[String] = if (args == null) Nil else args.toList.drop(1)
    while (rest.nonEmpty) {
      val arg = rest.head
      rest = rest.tail
      opt match {
        case Some(o) =>
          kargs += (o -> arg)
          opt = None
        case None =>
          if (required.nonEmpty) {
            result :+= Some(arg)
            required = required.tail
          } else if (optionals.nonEmpty && !arg.startsWith("-")) {
            result :+= Some(arg)
            optionals = optionals.tail
          } else if (arg.contains('=')) {
            val Array(key, value) = arg.split("=", 2)
            if (!key.startsWith("--")) throw InvalidOption(s"invalid option: $arg")
            opt = Some(key.drop(2))
            rest = value :: rest
          } else {
            if (!arg.startsWith("--")) throw InvalidOption(s"invalid option: $arg")
            val t = arg.drop(2)
            if (parsed.options.getOrElse(t, false)) kargs += (s"op_$t" -> true)
            else opt = Some(t)
          }
      }
    }
    opt.foreach(o => throw InvalidOption(s"missing value for $o"))
    if (required.nonEmpty) throw InvalidOption(s"missing ${required.head}")
    while (result.size < nPositionals) result :+= None
    ParsedArgs(result, kargs)
  }
}
